package graft.profile

import graft.SparkSpec
import graft.core.MinHash
import org.apache.spark.sql.Row

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  // s: strings with empty + null; n: ints with null; d: doubles
  private lazy val df = Seq(
    (Some("apple"), Some(1L), 1.0),
    (Some("banana pie"), Some(2L), 2.0),
    (Some(""), Some(3L), 3.0),       // empty string -> null (P2)
    (None: Option[String], None: Option[Long], 4.0),
    (Some("apple"), Some(5L), 10.0)
  ).toDF("s", "n", "d")

  private lazy val prof = Profiler.profile(df, "t").collect()
    .map(r => r.getAs[String]("col_name") -> r).toMap

  test("num_nan counts nulls incl. empty-string promotion") {
    assert(prof("s").getAs[Long]("num_nan") == 2) // "" and null
    assert(prof("n").getAs[Long]("num_nan") == 1)
    assert(prof("d").getAs[Long]("num_nan") == 0)
  }

  test("unique includes null as a value (pandas Series.unique parity)") {
    assert(prof("s").getAs[Long]("unique") == 3) // apple, banana pie, null
    assert(prof("n").getAs[Long]("unique") == 5) // 1,2,3,5,null
    assert(prof("d").getAs[Long]("unique") == 5)
  }

  test("rows and types") {
    assert(prof("s").getAs[Long]("rows") == 5)
    assert(prof("s").getAs[String]("col_type") == "string")
    assert(prof("n").getAs[String]("col_type") == "integer")
    assert(prof("d").getAs[String]("col_type") == "float")
  }

  test("quantile vector: 13 slots = deciles + mean + std_pop + min + max") {
    val q = prof("d").getAs[scala.collection.Seq[Double]]("quantile")
    assert(q.length == 13)
    val data = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    assert(q(9) == data.sum / 5)                       // mean
    val mu = data.sum / 5
    val varp = data.map(x => (x - mu) * (x - mu)).sum / 5
    assert(math.abs(q(10) - math.sqrt(varp)) < 1e-12)  // std (population)
    assert(q(11) == 1.0 && q(12) == 10.0)              // min, max
    assert(q(4) == 3.0)                                // median
    assert(prof("s").isNullAt(prof("s").fieldIndex("quantile"))) // strings: none
  }

  test("std guard: unique<=2 forces std 0 (data_prep.py:238-241)") {
    val tiny = Seq(7.0, 7.0, 7.0, 9.0).toDF("x")
    val p = Profiler.profile(tiny, "tiny").collect()(0)
    val q = p.getAs[scala.collection.Seq[Double]]("quantile")
    assert(q(10) == 0.0)
  }

  test("cell_width only for strings, equals avg byte length") {
    // non-null strings after P2: "apple"(5), "banana pie"(10), "apple"(5)
    assert(math.abs(prof("s").getAs[Double]("cell_width") - 20.0 / 3) < 1e-9)
    assert(prof("n").isNullAt(prof("n").fieldIndex("cell_width")))
  }

  test("minhash_exact matches core sketch of distinct present values") {
    val d = prof("n").getAs[scala.collection.Seq[Long]]("minhash_exact").toArray
    assert(d.sameElements(MinHash.sketch(Seq("1", "2", "3", "5"))))
  }

  test("minhash_words tokenizes string cells; absent for numerics") {
    val d = prof("s").getAs[scala.collection.Seq[Long]]("minhash_words").toArray
    assert(d.sameElements(MinHash.sketch(Seq("apple", "banana", "pie"))))
    assert(prof("n").isNullAt(prof("n").fieldIndex("minhash_words")))
  }

  test("content snapshot equals sketch of row strings") {
    val snap = Profiler.contentSnapshot(df, "t").collect()(0)
      .getAs[scala.collection.Seq[Long]]("content_snapshot").toArray
    // concat_ws skips nulls -> row 4 renders as "4.0"
    val rows = Seq("apple 1 1.0", "banana pie 2 2.0", " 3 3.0", "4.0", "apple 5 10.0")
    assert(snap.sameElements(MinHash.sketch(rows)))
  }

  test("date columns profile as 'date' with epoch quantiles") {
    val dd = Seq(java.sql.Timestamp.valueOf("2021-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2021-01-03 00:00:00")).toDF("ts")
    val p = Profiler.profile(dd, "dates").collect()(0)
    assert(p.getAs[String]("col_type") == "date")
    assert(p.isNullAt(p.fieldIndex("quantile"))) // only numeric get quantile vec
    assert(p.getAs[Double]("min_v") == 1609459200.0)
  }
}

/** Contract of the re-agg-free decilesFromHist (round 8): duplicate
  * (keys, value_num) histogram rows — e.g. a stage-1 histogram still
  * split by value_str, or pre-split freq counts — subdivide a value's
  * rank interval and must yield IDENTICAL deciles to the aggregated
  * histogram, and to Spark's own exact percentile.
  */
class DecilesFromHistSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import spark.implicits._

  private val probs = Profiler.QuantileProbs

  test("duplicate value rows give the same deciles as the aggregated histogram") {
    // column 0: skewed ints with heavy ties; column 1: near-unique doubles
    val vals = (1 to 500).map(i => (0, (i % 7).toDouble, 1L)) ++
      (1 to 400).map(i => (1, i * 1.25, 1L))
    // split each value's frequency across 3 duplicate rows
    val dup = vals.flatMap { case (c, v, _) => Seq((c, v, 1L), (c, v, 1L), (c, v, 1L)) }
      .toDF("col_idx", "value_num", "freq")
    val agg = dup.groupBy("col_idx", "value_num").agg(sum("freq").as("freq"))
    val a = Profiler.decilesFromHist(dup, probs).collect()
      .map(r => r.getAs[Int]("col_idx") -> r.getAs[Seq[Double]]("deciles")).toMap
    val b = Profiler.decilesFromHist(agg, probs).collect()
      .map(r => r.getAs[Int]("col_idx") -> r.getAs[Seq[Double]]("deciles")).toMap
    assert(a == b)
    // cross-check against Spark's built-in exact percentile on the
    // expanded multiset (each dup row carries freq 1 = one element)
    val expanded = dup.select(col("col_idx"), col("value_num"))
    val exact = expanded.groupBy("col_idx")
      .agg(expr(s"percentile(value_num, array(${probs.mkString(",")}))").as("p"))
      .collect().map(r => r.getAs[Int]("col_idx") -> r.getAs[Seq[Double]]("p")).toMap
    probs.indices.foreach { i =>
      assert(math.abs(a(0)(i) - exact(0)(i)) < 1e-9, s"col0 q$i")
      assert(math.abs(a(1)(i) - exact(1)(i)) < 1e-9, s"col1 q$i")
    }
  }

  test("single-value and two-value columns interpolate exactly") {
    val h = Seq((0, 5.0, 10L), (1, 1.0, 1L), (1, 2.0, 1L))
      .toDF("col_idx", "value_num", "freq")
    val d = Profiler.decilesFromHist(h, probs).collect()
      .map(r => r.getAs[Int]("col_idx") -> r.getAs[Seq[Double]]("deciles")).toMap
    assert(d(0).forall(_ == 5.0))
    // two values, n=2: pos = p*(n-1) = p -> lo=0, hi=1 interpolation
    probs.indices.foreach { i =>
      assert(math.abs(d(1)(i) - (1.0 + probs(i))) < 1e-12)
    }
  }
}

/** Plan-shape guard for the stage-1 histogram sharing. Round 8 pinned
  * AQE exchange reuse between the stats and decile branches; round 16
  * replaced the shared exchange with ONE materialized stage-1 leaf
  * (eager localCheckpoint + stats barrier) that the stats branch, the
  * decile cum-sums, and every decile small-side broadcast read — so the
  * cell relation is scanned exactly once per run and no driver-built
  * broadcast replays the scan+shuffle under load (the r14-r15
  * a4_quantiles in-suite inflation). The pin: with quantiles on, the
  * final executed plan's leaves are the materialized RDD only — the raw
  * input relation must NOT appear. */
class ProfilePlanReuseSpec extends SparkSpec {
  import spark.implicits._

  test("decile branch reads the materialized stage-1 leaf, never the raw input") {
    val df = (1 to 5000).map(i => (i % 37, i.toDouble % 101, s"s$i")).toDF("a", "b", "c")
    val prof = Profiler.profile(df, "t", withSketches = false)
    prof.collect()
    val plan = prof.queryExecution.executedPlan.toString
    // the materialized histogram leaf feeds the final plan...
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the materialized stage-1 leaf in the plan; plan:\n$plan")
    // ...and the raw input relation is not re-scanned by it (it was
    // consumed once, inside the eager checkpoint job)
    assert(!plan.contains("LocalTableScan"),
      s"raw input must not be re-scanned by the final plan; plan:\n$plan")
  }

  test("without quantiles the profile stays a single un-materialized aggregate") {
    val df = (1 to 500).map(i => (i % 7, i.toDouble)).toDF("a", "b")
    val prof = Profiler.profile(df, "t", withSketches = false, withQuantiles = false)
    prof.collect()
    val plan = prof.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan") && !plan.contains("Scan ExistingRDD"),
      s"no-quantile profile must read the input directly; plan:\n$plan")
  }
}
