package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact output equals brute-force groupBy under any partitioning") {
    // skewed stream: "a"×600, "b"×200, "c"×90, 110 singletons; n = 1000
    val vals = Seq.fill(600)("a") ++ Seq.fill(200)("b") ++ Seq.fill(90)("c") ++
      (0 until 110).map(i => s"x$i")
    val df = vals.toDF("v").repartition(7) // arbitrary partitioning
    // threshold 1/10 with capacity 9 (guarantee: 10·1 ≥ 10)
    val out = HeavyHitters.exact(df, "v", k = 9, num = 1, den = 10).collect()
    assert(out.map(r => (r.getString(0), r.getAs[Long]("n"))).toSeq ==
      Seq(("a", 600L), ("b", 200L))) // c at 9% misses the strict 10% cut
    assert(out.head.getAs[Double]("share") == 0.6)
  }

  test("summary survives adversarial merges: capacity below distinct count") {
    val vals = Seq.fill(400)("hot") ++ (0 until 500).map(i => s"cold$i")
    // capacity 3 over 501 distinct keys forces constant decrements and
    // merge-time cuts; the n/(k+1) = 225-guarantee key must survive
    val df = vals.toDF("v").repartition(11)
    val keys = HeavyHitters.summary(df, "v", k = 3)
      .select(map_keys(col("mg"))).as[Seq[String]].head()
    assert(keys.contains("hot"))
    val out = HeavyHitters.exact(df, "v", k = 3, num = 1, den = 4).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("hot"))
  }

  test("thresholds below the MG guarantee are rejected") {
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException] {
      HeavyHitters.exact(df, "v", k = 9, num = 1, den = 100) // 1% needs k ≥ 99
    }
  }

  test("nulls are skipped and do not count toward the total") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b"))
      .toDF("v")
    val out = HeavyHitters.exact(df, "v", k = 4, num = 1, den = 2).collect()
    // total counts non-null rows only (4): a at 3/4 passes the 1/2 cut
    assert(out.map(r => (r.getString(0), r.getAs[Long]("n"))).toSeq ==
      Seq(("a", 3L)))
  }
}
