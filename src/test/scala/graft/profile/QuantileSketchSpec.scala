package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {
  import spark.implicits._

  // mixed-scale numerics: ints spanning octaves, sub-micro floats,
  // negatives, nulls
  private lazy val full = (1 to 2000).map { i =>
    val v: java.lang.Double =
      if (i % 17 == 0) null
      else if (i % 3 == 0) -i * 0.25
      else i * i * 0.001
    (i.toLong, v, s"s$i")
  }.toDF("id", "v", "s")

  private def bucketCounts(df: org.apache.spark.sql.DataFrame): Map[(String, Long, Long), Long] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap

  test("merge of chunk sketches == sketch of the whole (exact)") {
    val chunks = Seq(full.filter($"id" % 3 === 0), full.filter($"id" % 3 === 1),
      full.filter($"id" % 3 === 2))
      .map(QuantileSketch.sketchChunk(_, "t")).reduce(_ unionByName _)
    val merged = bucketCounts(QuantileSketch.merge(chunks)
      .select("table_name", "col_idx", "bucket", "cnt"))
    val whole = bucketCounts(QuantileSketch.merge(QuantileSketch.sketchChunk(full, "t"))
      .select("table_name", "col_idx", "bucket", "cnt"))
    assert(merged == whole)
  }

  test("decile estimates within the sketch's relative error bound") {
    val sk = QuantileSketch.merge(QuantileSketch.sketchChunk(full, "t"))
    val ests = QuantileSketch.deciles(sk)
      .filter($"col_idx" === 1)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(ests.keySet == (1L to 9L).toSet)
    val vals = full.select("v").na.drop().as[Double].collect().sorted
    (1 to 9).foreach { k =>
      val rank = math.max(1, (vals.length * k + 9) / 10) // ceil(n*k/10)
      val truth = vals(rank - 1)
      val est = ests(k.toLong)
      // midpoint error <= half a bucket (rel 2^-6) + micro quantization
      val tol = math.abs(truth) / 32.0 + 2e-6
      assert(math.abs(est - truth) <= tol,
        s"decile $k: est $est vs truth $truth (tol $tol)")
      assert(math.signum(est) == math.signum(truth) || truth == 0.0)
    }
  }

  test("values under 63 micro-units are exact (single-integer buckets)") {
    val tiny = (1 to 100).map(i => ((i % 63).toLong * 1e-6 * (if (i % 2 == 0) 1 else -1)))
      .toDF("v")
    val sk = QuantileSketch.merge(QuantileSketch.sketchChunk(tiny, "tiny"))
    val ests = QuantileSketch.deciles(sk).filter($"col_idx" === 0)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val vals = tiny.as[Double].collect()
      .map(v => math.floor(v * 1e6) / 1e6).sorted // sketch sees micro-floored values
    (1 to 9).foreach { k =>
      val rank = math.max(1, (vals.length * k + 9) / 10)
      assert(math.abs(ests(k.toLong) - vals(rank - 1)) < 1e-12,
        s"decile $k not exact: ${ests(k.toLong)} vs ${vals(rank - 1)}")
    }
  }

  test("bucket index is monotone in the value") {
    val vals = Seq(-5000.0, -31.5, -1e-6, 0.0, 1e-6, 3.1e-5, 0.5, 31.0, 32.0,
      33.0, 1023.0, 1024.0, 4.2e6).toDF("v")
    val got = QuantileSketch.withBucket(vals, col("v"), "b")
      .orderBy("v").select("b").as[Long].collect()
    assert(got.sameElements(got.sorted), s"buckets not monotone: ${got.mkString(",")}")
  }
}
