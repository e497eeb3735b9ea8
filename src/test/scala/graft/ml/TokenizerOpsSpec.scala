package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenizerOpsSpec extends SparkSpec {
  import spark.implicits._

  test("colPositionEncoding: cumsum of SEPs, 0 at specials (T3)") {
    val df = Seq(Tuple1(Seq("[CLS]", "a", "b", "[SEP]", "c", "[SEP]", "d", "[PAD]")))
      .toDF("toks")
    val enc = df.select(TokenizerOps.colPositionEncoding(col("toks")))
      .collect()(0).getAs[scala.collection.Seq[Int]](0)
    assert(enc == Seq(0, 1, 1, 0, 2, 0, 3, 0))
  }

  test("mlmMaskPlan deterministic, ~15% masked, specials kept") {
    val toks = Seq.fill(400)("tok") ++ Seq("[CLS]", "[SEP]")
    val df = Seq(Tuple1(toks)).toDF("toks")
    val plan1 = df.select(TokenizerOps.mlmMaskPlan(col("toks"), lit("t1")))
      .collect()(0).getAs[scala.collection.Seq[String]](0)
    val plan2 = df.select(TokenizerOps.mlmMaskPlan(col("toks"), lit("t1")))
      .collect()(0).getAs[scala.collection.Seq[String]](0)
    assert(plan1 == plan2)
    val masked = plan1.count(_ != "keep")
    assert(masked > 20 && masked < 120, s"masked=$masked of 402")
    assert(plan1.takeRight(2).forall(_ == "keep"))
  }

  test("pairConcat respects per-side budget (T6)") {
    val df = Seq((Seq("a", "b", "c", "d"), Seq("x", "y", "z"))).toDF("s1", "s2")
    val out = df.select(TokenizerOps.pairConcat(col("s1"), col("s2"), 4))
      .collect()(0).getAs[scala.collection.Seq[String]](0)
    assert(out == Seq("a", "b", "x", "y"))
  }

  test("oneHot (T7)") {
    val df = Seq(Tuple1(Seq(0, 3))).toDF("labels")
    val out = df.select(TokenizerOps.oneHot(col("labels"), 5))
      .collect()(0).getAs[scala.collection.Seq[Double]](0)
    assert(out == Seq(1.0, 0.0, 0.0, 1.0, 0.0))
  }
}

class EvaluationSpec extends SparkSpec {
  import spark.implicits._
  test("precisionAtK / recall with explode + semi-join (J3)") {
    val results = Seq(
      ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "x", 3L),
      ("q2", "m", 1L), ("q2", "n", 2L), ("q2", "o", 3L))
      .toDF("query", "candidate", "rank")
    val gt = Seq(("q1", Seq("a", "b")), ("q2", Seq("zz")))
      .toDF("query", "expected")
    val per = graft.search.Evaluation.precisionAtK(results, gt, k = 3)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(per("q1") == (math.rint(2.0 / 3 * 1e6) / 1e6, 1.0))
    assert(per("q2") == (0.0, 0.0))
    val macroRow = graft.search.Evaluation.macroAverage(
      graft.search.Evaluation.precisionAtK(results, gt, 3)).collect()(0)
    assert(macroRow.getAs[Long]("n_queries") == 2)
  }

  test("ndcgAtK: perfect ranking 1.0, miss 0.0, late hit discounted") {
    val results = Seq(
      ("q1", "a", 1L), ("q1", "b", 2L), ("q1", "x", 3L), // both rels up top
      ("q2", "m", 1L), ("q2", "n", 2L), ("q2", "o", 3L), // no rels at all
      ("q3", "u", 1L), ("q3", "v", 2L), ("q3", "c", 3L)) // one rel at pos 3
      .toDF("query", "candidate", "rank")
    val gt = Seq(("q1", Seq("a", "b")), ("q2", Seq("zz")), ("q3", Seq("c")))
      .toDF("query", "expected")
    val per = graft.search.Evaluation.ndcgAtK(results, gt, k = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(per("q1") == 1.0)
    assert(per("q2") == 0.0)
    // DCG = 1/log2(4), IDCG = 1/log2(2) = 1 → ndcg = 0.5
    assert(math.abs(per("q3") - 0.5) < 1e-5)
  }
}
