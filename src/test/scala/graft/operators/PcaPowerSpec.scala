package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Ann.powerIterationPca]]: planted-direction recovery,
  * partitioning invariance (every sum is integral), canonical sign,
  * and the degenerate zero-variance corpus.
  */
class PcaPowerSpec extends SparkSpec {
  import spark.implicits._

  private def planted(n: Int, d: Int): Seq[(Long, Array[Float])] = {
    // dominant direction w = (3,1,0,…)/√10 with ±spread, plus small
    // deterministic per-dim jitter — no RNG, reproducible
    (0 until n).map { i =>
      val a = if (i % 2 == 0) 1.0 + i % 5 else -(1.0 + i % 5)
      val v = Array.tabulate(d) { j =>
        val w = if (j == 0) 3.0 / math.sqrt(10) else if (j == 1) 1.0 / math.sqrt(10) else 0.0
        (a * w + 0.01 * ((i * 7 + j * 13) % 11 - 5)).toFloat
      }
      (i.toLong, v)
    }
  }

  test("recovers a planted dominant direction with high explained variance") {
    val df = planted(60, 8).toDF("vec_id", "embedding")
    val out = Ann.powerIterationPca(df).orderBy("dim").collect()
    assert(out.length == 8)
    val v = out.map(_.getLong(1).toDouble)
    val w = Array(3.0 / math.sqrt(10), 1.0 / math.sqrt(10), 0, 0, 0, 0, 0, 0)
    val cos = {
      val dot = v.zip(w).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(w.map(x => x * x).sum))
    }
    assert(math.abs(cos) > 0.995, s"direction off: cos=$cos v=${v.mkString(",")}")
    val ev = out.head.getDouble(2)
    assert(ev > 0.9, s"planted direction should dominate variance: $ev")
  }

  test("sign is canonical: lowest-dim nonzero component positive") {
    val df = planted(60, 8).toDF("vec_id", "embedding")
    val out = Ann.powerIterationPca(df).orderBy("dim").collect()
    val firstNonzero = out.find(_.getLong(1) != 0L).get
    assert(firstNonzero.getLong(1) > 0L)
  }

  test("partitioning-invariant: repartition(7) gives identical output") {
    val df = planted(40, 6).toDF("vec_id", "embedding")
    val a = Ann.powerIterationPca(df).orderBy("dim").collect().toSeq
    val b = Ann.powerIterationPca(df.repartition(7)).orderBy("dim").collect().toSeq
    assert(a == b)
  }

  test("abtt removes the planted component: residual variance small, anisotropy falls") {
    val df = planted(60, 8).toDF("vec_id", "embedding")
    val r = Ann.abttReport(df).collect().head
    assert(r.getAs[Double]("ev_top_share") > 0.9)
    assert(r.getAs[Double]("var_retained") < 0.1)
    assert(r.getAs[Double]("axis_aniso_after") <
      r.getAs[Double]("axis_aniso_before"))
  }

  test("abtt is partitioning-invariant") {
    val df = planted(40, 6).toDF("vec_id", "embedding")
    val a = Ann.abttReport(df).collect().toSeq
    val b = Ann.abttReport(df.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("a dominant direction orthogonal to all-ones is still found " +
      "(perturbed start regression)") {
    // x_i = t_i·(1, -1)/√2 + jitter: centered components sum to ~0 per
    // row, so a FLAT start vector would have zero overlap and the
    // iteration would return the zero vector
    val df = (0 until 40).map { i =>
      val t = (if (i % 2 == 0) 1 else -1) * (1.0 + i % 7)
      (i.toLong, Array((t + 0.001 * (i % 3)).toFloat, (-t).toFloat,
        (0.002 * ((i * 5) % 4)).toFloat, 0.0f))
    }.toDF("vec_id", "embedding")
    val out = Ann.powerIterationPca(df).orderBy("dim").collect()
    val v = out.map(_.getLong(1).toDouble)
    assert(math.abs(v(0)) > 100000 && math.abs(v(1)) > 100000,
      s"anti-correlated direction missed: ${v.mkString(",")}")
    assert(v(0) * v(1) < 0, "components must oppose")
    assert(out.head.getDouble(2) > 0.9)
  }

  test("zero-variance corpus degenerates to zero vector and zero share") {
    val const = (0 until 10).map(i => (i.toLong, Array.fill(4)(0.25f)))
    val out = Ann.powerIterationPca(const.toDF("vec_id", "embedding"))
      .orderBy("dim").collect()
    assert(out.forall(_.getLong(1) == 0L))
    assert(out.forall(_.getDouble(2) == 0.0))
  }
}
