package graft.profile

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private val spec = Kmv.KmvSpec(k = 128)

  test("below-k sets are counted exactly") {
    val values = (1 to 90).map(i => s"small-$i").toDF("v")
    val est = Kmv.estimate(Kmv.sketch(values, "v", spec), spec)
      .collect().head.getAs[Double]("kmv_estimate")
    assert(est == 90.0, s"sub-k estimate must be exact, got $est")
  }

  test("estimate tracks exact cardinality within the sigma band") {
    val values = (1 to 20000).map(i => s"value-$i").toDF("v")
    val est = Kmv.estimate(Kmv.sketch(values, "v", spec), spec)
      .collect().head.getAs[Double]("kmv_estimate")
    // sigma ~ 1/sqrt(k-2) ~ 8.9% at k=128; allow 3 sigma
    assert(math.abs(est - 20000) / 20000.0 < 0.27, s"estimate $est too far from 20000")
  }

  test("duplicates do not move the sketch; size stays bounded by k") {
    val base = (1 to 700).map(i => s"dup-$i")
    val s1 = Kmv.sketch(base.toDF("v"), "v", spec)
    val s3 = Kmv.sketch((base ++ base ++ base).toDF("v"), "v", spec)
    assert(s1.count() == spec.k && s3.count() == spec.k)
    assert(s1.except(s3).isEmpty && s3.except(s1).isEmpty)
  }

  test("merge equals whole-corpus build, grouped") {
    val a = (1 to 900).map(i => (if (i % 2 == 0) "x" else "y", s"item-$i")).toDF("g", "v")
    val b = (400 to 1500).map(i => (if (i % 3 == 0) "x" else "y", s"item-$i")).toDF("g", "v")
    val merged = Kmv.merge(
      Kmv.sketch(a, "v", spec, Seq("g")),
      Kmv.sketch(b, "v", spec, Seq("g")), spec, Seq("g"))
    val whole = Kmv.sketch(a.union(b), "v", spec, Seq("g"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
  }

  test("set estimates recover known overlap structure") {
    // A = 1..4000, B = 2001..6000 → |A∪B| = 6000, |A∩B| = 2000, J = 1/3
    val rows = (1 to 4000).map(i => ("a", s"e-$i")) ++
      (2001 to 6000).map(i => ("b", s"e-$i"))
    val sk = Kmv.sketch(rows.toDF("g", "v"), "v", spec, Seq("g"))
    val r = Kmv.setEstimates(sk, "g", spec).collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    val u = r.getAs[Double]("union_est")
    val ix = r.getAs[Double]("intersect_est")
    val j = r.getAs[Double]("jaccard_est")
    assert(math.abs(u - 6000) / 6000.0 < 0.30, s"union $u")
    assert(math.abs(j - 1.0 / 3.0) < 0.15, s"jaccard $j")
    assert(math.abs(ix - 2000) / 2000.0 < 0.45, s"intersection $ix")
  }

  test("disjoint sets estimate near-zero intersection") {
    val rows = (1 to 3000).map(i => ("a", s"left-$i")) ++
      (1 to 3000).map(i => ("b", s"right-$i"))
    val sk = Kmv.sketch(rows.toDF("g", "v"), "v", spec, Seq("g"))
    val r = Kmv.setEstimates(sk, "g", spec).collect().head
    assert(r.getAs[Double]("jaccard_est") < 0.05)
  }
}
