package graft.profile

import graft.SparkSpec

class EquiDepthSpec extends SparkSpec {
  import spark.implicits._

  test("uniform data bins near-evenly; all rows accounted for") {
    val df = (1 to 1000).map(_.toDouble).toDF("v")
    val out = QuantileSketch.equiDepthBins(df, "v").collect()
    assert(out.map(_.getAs[Long]("n_rows")).sum == 1000L)
    // HDR cuts on smooth data: no bin should hoard the population
    assert(out.forall(_.getAs[Long]("n_rows") < 400L))
    assert(out.map(_.getAs[Long]("bin")).distinct.length == out.length)
  }

  test("binning is partitioning-invariant (mergeable sketch + integer cuts)") {
    val df = (1 to 500).map(i => (i * 3.7) % 97).toDF("v")
    val a = QuantileSketch.equiDepthBins(df, "v")
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_rows")).toMap
    val b = QuantileSketch.equiDepthBins(df.repartition(13), "v")
      .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n_rows")).toMap
    assert(a == b)
  }

  test("constant column collapses to a single bin") {
    val df = Seq.fill(50)(42.0).toDF("v")
    val out = QuantileSketch.equiDepthBins(df, "v").collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_rows") == 50L &&
      out.head.getAs[Double]("share") == 1.0)
  }
}
