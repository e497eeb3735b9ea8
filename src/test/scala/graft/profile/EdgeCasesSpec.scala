package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input hardening: the shapes a real lake throws at the
  * profiler daily — empty tables, all-null columns, single rows, unicode,
  * very wide schemas.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("profile of an empty table: zero rows per column, no crash") {
    val empty = Seq.empty[(Long, String)].toDF("a", "b")
    val p = Profiler.profile(empty, "t").collect()
    assert(p.length == 2)
    assert(p.forall(_.getAs[Long]("rows") == 0))
  }

  test("all-null column: num_nan == rows, no digest, unique counts null") {
    val df = Seq((1L, null: String), (2L, null: String), (3L, null: String))
      .toDF("id", "dead")
    val p = Profiler.profile(df, "t").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p("dead").getAs[Long]("num_nan") == 3)
    assert(p("dead").getAs[Long]("unique") == 1) // null is a value (A2)
    assert(p("dead").getAs[Any]("minhash_exact") == null) // no spurious match
  }

  test("single-row table: quantile vector omitted (reference guard)") {
    val df = Seq((42L, "x")).toDF("n", "s")
    val p = Profiler.profile(df, "t").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p("n").getAs[Any]("quantile") == null)
    assert(p("n").getAs[Long]("rows") == 1)
  }

  test("unicode values sketch and round-trip") {
    val df = Seq((1L, "héllo wörld"), (2L, "日本語テキスト"), (3L, "émoji 🎉 ok"),
      (4L, "çédille"), (5L, "ASCII")).toDF("id", "txt")
    val p = Profiler.profile(df, "t").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p("txt").getAs[Long]("unique") == 5)
    assert(p("txt").getAs[scala.collection.Seq[Long]]("minhash_exact").length == 100)
    // same values -> same digest regardless of row order
    val p2 = Profiler.profile(df.orderBy(desc("id")), "t").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(p("txt").getAs[scala.collection.Seq[Long]]("minhash_exact") ==
      p2("txt").getAs[scala.collection.Seq[Long]]("minhash_exact"))
  }

  test("wide table (120 columns) profiles every column") {
    val n = 120
    val rows = (1 to 50).map(i => org.apache.spark.sql.Row.fromSeq(
      (0 until n).map(j => s"v${i % (j + 2)}")))
    val schema = org.apache.spark.sql.types.StructType(
      (0 until n).map(j => org.apache.spark.sql.types.StructField(
        s"c$j", org.apache.spark.sql.types.StringType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows.toIndexedSeq), schema)
    val p = Profiler.profile(df, "wide")
    assert(p.count() == n)
    assert(p.filter(col("rows") =!= 50).isEmpty)
  }

  test("dedup and text ops tolerate empty corpora") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.Dedup.minhashNearDups(empty).isEmpty)
    assert(graft.operators.TextAnalysis.qualityFilter(empty).isEmpty)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val docs = Seq((1L, "keep me")).toDF("doc_id", "text")
    assert(graft.operators.Dedup.dropNearDuplicates(docs, noPairs).count() == 1)
  }

  test("huge-magnitude and non-finite numerics profile without ANSI overflow") {
    // 1e22-scale values (decimal CSV columns) and ±Infinity would make the
    // exact-decimal sum cast THROW under ANSI; such columns must fall back
    // to double-summed mean/std, with in-range columns unaffected
    val df = Seq(
      (1L, 2.2345678901234568e22, 1.5, Double.PositiveInfinity),
      (2L, 1.2345678901234568e22, 2.5, 1.0),
      (3L, 3.2345678901234567e18, 3.5, 2.0),
      (4L, 1.0, 4.5, 3.0),
      (5L, 2.0, 5.5, 4.0)).toDF("id", "huge", "small", "inf")
    val p = Profiler.profile(df, "t").collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val hq = p("huge").getAs[collection.Seq[Double]]("quantile")
    assert(hq != null && hq.length == 13)
    val n = 5.0
    val xs = Seq(2.2345678901234568e22, 1.2345678901234568e22,
      3.2345678901234567e18, 1.0, 2.0)
    assert(math.abs(hq(9) - xs.sum / n) / (xs.sum / n) < 1e-9) // double mean
    // the in-range column still takes the exact decimal path
    val sq = p("small").getAs[collection.Seq[Double]]("quantile")
    assert(sq(9) == 3.5 && sq(11) == 1.5 && sq(12) == 5.5)
    // Infinity column: no crash; mean/vector propagate Infinity
    assert(p("inf").getAs[Long]("rows") == 5)
    // incremental path survives the same inputs
    val merged = Incremental.finalize(Incremental.merge(
      Incremental.profileChunk(df.limit(3), "t")
        .unionByName(Incremental.profileChunk(df.offset(3), "t"))))
    val hm = merged.filter(col("col_idx") === 1).select("mean")
      .collect()(0).getDouble(0)
    assert(math.abs(hm - xs.sum / n) / (xs.sum / n) < 1e-9)
  }
}
