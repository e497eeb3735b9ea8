package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val full = (1 to 1000)
    .map(i => (i.toLong, s"name${i % 300}", if (i % 10 == 0) null else s"v$i"))
    .toDF("id", "name", "val")

  test("merge of chunk profiles == from-scratch profile (all fields)") {
    val (h1, h2) = (full.filter($"id" <= 500), full.filter($"id" > 500))
    val merged = Incremental.finalize(Incremental.merge(
      Incremental.profileChunk(h1, "t").unionByName(Incremental.profileChunk(h2, "t"))))
    val direct = Incremental.finalize(Incremental.merge(
      Incremental.profileChunk(full, "t")))
    val m = merged.orderBy("col_idx").collect()
    val d = direct.orderBy("col_idx").collect()
    assert(m.length == 3 && d.length == 3)
    m.zip(d).foreach { case (a, b) =>
      // counts, digests, bounds, sums identical; HLL estimates agree
      // within the sketch error bound (mode promotion differs per path)
      assert(a.getAs[Long]("rows") == b.getAs[Long]("rows"))
      assert(a.getAs[Long]("num_nan") == b.getAs[Long]("num_nan"))
      val (ea, eb) = (a.getAs[Long]("unique_est"), b.getAs[Long]("unique_est"))
      assert(math.abs(ea - eb) <= math.max(5L, (0.05 * eb).toLong),
        s"hll estimates diverged: $ea vs $eb")
      assert(a.getAs[scala.collection.Seq[Long]]("minhash_exact") ==
        b.getAs[scala.collection.Seq[Long]]("minhash_exact"))
      assert(a.getAs[Any]("min_v") == b.getAs[Any]("min_v"))
      assert(a.getAs[Any]("max_v") == b.getAs[Any]("max_v"))
      assert(a.getAs[java.math.BigDecimal]("sum_dec") == b.getAs[java.math.BigDecimal]("sum_dec"))
    }
  }

  test("merged digest equals the batch profiler's digest (cross-path)") {
    val (h1, h2) = (full.filter($"id" % 2 === 0), full.filter($"id" % 2 === 1))
    val merged = Incremental.merge(
      Incremental.profileChunk(h1, "t").unionByName(Incremental.profileChunk(h2, "t")))
      .select("col_idx", "minhash_exact")
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("minhash_exact")).toMap
    val batch = Profiler.profile(full, "t")
      .select(col("col_idx").cast("long"), col("minhash_exact"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("minhash_exact")).toMap
    batch.foreach { case (ci, dig) =>
      if (dig != null) assert(merged(ci) == dig, s"col $ci digest mismatch")
    }
  }

  test("hll estimate is close to true distinct count") {
    val prof = Incremental.finalize(Incremental.merge(
      Incremental.profileChunk(full, "t"))).filter($"col_idx" === 1)
    val est = prof.first().getAs[Long]("unique_est")
    assert(math.abs(est - 300) <= 15, s"estimate $est too far from 300")
  }
}
