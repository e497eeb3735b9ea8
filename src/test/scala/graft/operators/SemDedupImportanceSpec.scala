package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup (cluster-scoped semantic dedup) and DSIR importance
  * resampling semantics. */
class SemDedupImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def embs(vs: (Long, Seq[Float])*) =
    vs.toSeq.toDF("vec_id", "embedding")

  test("semDedup removes later-id near-duplicates within a cluster") {
    val df = embs(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(1f, 0f, 0f, 0f),
      3L -> Seq(1f, 0f, 0f, 0f), 4L -> Seq(0f, 1f, 0f, 0f),
      5L -> Seq(0f, 1f, 0f, 0f), 6L -> Seq(0f, 0f, 1f, 0f))
    val out = Ann.semDedup(df, threshold = 0.99, kCells = 1)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq ==
      Seq((2L, 1L, 1.0), (3L, 1L, 1.0), (5L, 4L, 1.0)))
  }

  test("semDedup triangular rule: the dominating member need not survive") {
    val s = (1.0 / math.sqrt(2)).toFloat
    val df = embs(
      1L -> Seq(1f, 0f), 2L -> Seq(s, s), 3L -> Seq(0f, 1f))
    val out = Ann.semDedup(df, threshold = 0.7, kCells = 1)
      .orderBy("vec_id").collect()
    // 2 is dominated by 1; 3 is dominated by 2 EVEN THOUGH 2 is removed
    // (cos(1,3) = 0 < τ) — the paper's upper-triangular max rule.
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((2L, 1L), (3L, 2L)))
  }

  test("semDedup never pairs across cells") {
    // two tight, well-separated groups; 2 cells → each group is a cell,
    // so the only removals are within-group
    val df = embs(
      1L -> Seq(1f, 0f, 0f, 0f), 2L -> Seq(0f, 1f, 0f, 0f),
      3L -> Seq(0.99f, 0.01f, 0f, 0f), 4L -> Seq(0.01f, 0.99f, 0f, 0f))
    val out = Ann.semDedup(df, threshold = 0.9, kCells = 2, iters = 2)
      .orderBy("vec_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((3L, 1L), (4L, 2L)))
  }

  test("pqTopK: exact duplicates are each other's top hit, symmetrically") {
    // 3 exact-dup pairs in distinct directions + noise vectors; dim 8,
    // 2 subspaces, 4 codewords
    val base = Seq(
      Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), Seq(0f, 0f, 1f, 0f, 0f, 1f, 0f, 0f),
      Seq(0f, 0f, 0f, 0f, 0f, 0f, 1f, 1f))
    val df = embs(
      (base.zipWithIndex.flatMap { case (v, i) =>
        Seq((i * 2 + 1).toLong -> v, (i * 2 + 2).toLong -> v)
      } ++ Seq(7L -> Seq(.3f, .4f, .5f, .6f, .1f, .2f, .3f, .4f),
        8L -> Seq(.9f, .8f, .7f, .6f, .5f, .4f, .3f, .2f))): _*)
    val out = Ann.pqTopK(df, df, k = 1, nSub = 2, nCodes = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // twins share codes, so each is the other's rank-1 ADC neighbor; the
    // distance is to the RECONSTRUCTION (identical dist tables → equal
    // both ways), not 0 unless the codeword equals the subvector
    for (Seq(a, b) <- (1L to 6L).grouped(2)) {
      assert(out(a)._1 == b, s"$a -> ${out(a)}")
      assert(out(b)._1 == a, s"$b -> ${out(b)}")
      assert(out(a)._2 == out(b)._2, s"asymmetric ADC: ${out(a)} vs ${out(b)}")
    }
  }

  test("pqEncode: every vector gets one code per subspace") {
    val df = embs((1L to 10L).map(i =>
      i -> Seq.tabulate(8)(d => (i * d % 5).toFloat)): _*)
    val cents = Ann.pqCodebooks(df, nSub = 4, k = 3, iters = 1)
    assert(cents.count() == 12) // 4 subspaces × 3 codewords
    val enc = Ann.pqEncode(df, cents, nSub = 4)
    assert(enc.groupBy("id").count().filter($"count" =!= 4).isEmpty)
    assert(enc.filter($"code" < 1 || $"code" > 3).isEmpty)
  }

  private val docs = Seq(
    (1L, "alpha alpha beta", "en"), (2L, "alpha beta gamma", "en"),
    (3L, "omega psi chi", "fr"), (4L, "omega omega psi", "fr"),
    (5L, "alpha alpha alpha alpha", "fr"), (6L, "", "fr"),
    (7L, "omega psi omega psi", "fr"), (8L, "beta alpha", "en"))
    .toDF("doc_id", "text", "lang")

  test("hashedFeatures counts unigrams + bigrams; empty docs drop") {
    val f = Importance.hashedFeatures(docs.filter($"doc_id" === 1L))
    // "alpha alpha beta": 3 unigrams + 2 bigrams
    assert(f.agg(sum("n")).as[Long].head() == 5L)
    assert(Importance.hashedFeatures(docs.filter($"doc_id" === 6L)).isEmpty)
  }

  test("importance weights favor target-distinctive vocabulary") {
    val target = docs.filter($"lang" === "en")
    val sampled = Importance.resample(docs, target, n = 8)
    val byDoc = sampled.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("logw_r")).toMap
    assert(byDoc.size == 8) // all docs ranked, ids distinct
    // alpha-heavy doc 5 must outweigh omega-heavy doc 7 (omega never
    // appears in the target); the empty doc carries weight 0
    assert(byDoc(5L) > byDoc(7L))
    assert(byDoc(6L) == 0.0)
    assert(byDoc(7L) < 0.0)
  }

  test("resample is invariant to input partitioning") {
    val target = docs.filter($"lang" === "en")
    val a = Importance.resample(docs, target, n = 5).collect().toSeq
    val b = Importance.resample(docs.repartition(7), target.repartition(3), n = 5)
      .collect().toSeq
    assert(a == b)
    assert(a.map(_.getAs[Long]("rank")) == (1L to 5L))
  }
}
