package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Ann.jlOverlapReport]]: partner pairs along orthogonal axes
  * keep their top-1 partner through the 16-dim ±1 sketch (overlap
  * 1.0 — cross-pair cosine ~0 cannot beat the ~1 partner even under
  * JL distortion), and the sign matrix is md5 parity, not RNG. */
class JlSpec extends SparkSpec {
  import spark.implicits._

  test("jlOverlapReport: orthogonal partner pairs survive the projection") {
    // 6 pairs on axes 0,10,20,30,40,50; partners share the axis with a
    // distinct small jitter, so top-1 is the partner in both spaces
    def v(axis: Int, jitterDim: Int): Seq[Float] =
      (0 until 64).map(j => (if (j == axis) 10f else 0f) +
        (if (j == jitterDim) 0.2f else 0f))
    val rows = (0 until 6).flatMap { p =>
      Seq((2L * p, v(10 * p, 60)), (2L * p + 1, v(10 * p, 61)))
    }
    val embs = rows.toDF("vec_id", "embedding")
    val out = Ann.jlOverlapReport(embs, embs, dOut = 16, dIn = 64, k = 1)
      .collect()(0)
    assert(out.getAs[Long]("dim_out") == 16L)
    assert(out.getAs[Double]("overlap_r") == 1.0,
      out.getAs[Double]("overlap_r"))
  }

  test("jl signs are md5 parity (deterministic, engine-replayable)") {
    // project unit basis vector e_j: output k = sign(j, k)
    val ej = (0 until 64).map(j => if (j == 3) 1f else 0f)
    val embs = Seq((1L, ej)).toDF("vec_id", "embedding")
    val projected = embs.withColumn("embedding",
      array((0 until 16).map { kk =>
        val row = (0 until 64).map { j =>
          if (graft.core.MinHash.md5Low32(s"jl:$j:$kk") % 2 == 0) 1.0 else -1.0
        }
        Ann.dot(col("embedding"), typedLit(row))
      }: _*))
    val r = projected.collect()(0)
    val got = r.getSeq[Double](r.fieldIndex("embedding"))
    (0 until 16).foreach { kk =>
      val want =
        if (graft.core.MinHash.md5Low32(s"jl:3:$kk") % 2 == 0) 1.0 else -1.0
      assert(got(kk) == want, s"k=$kk")
    }
  }
}

/** Pins [[Ann.kCenterCoreset]]: one pick per direction before any
  * near-duplicate, deterministic min-id ties, non-increasing gains. */
class KCenterSpec extends graft.SparkSpec {
  import spark.implicits._

  test("kCenterCoreset: covers directions before duplicates; gains non-increasing") {
    def e(i: Int, eps: Float = 0f): Seq[Float] =
      (0 until 8).map(j => (if (j == i) 1f else 0f) + (if (j == 7) eps else 0f))
    val embs = Seq(
      (1L, e(0)), (2L, e(0, 0.01f)), // near-duplicate pair on axis 0
      (3L, e(1)), (4L, e(2))).toDF("vec_id", "embedding")
    val out = Ann.kCenterCoreset(embs, k = 3).orderBy("sel_order").collect()
      .map(r => (r.getAs[Long]("sel_order"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("gain_micro")))
    assert(out.map(_._2).toSeq == Seq(1L, 3L, 4L), out.toSeq) // never 2
    assert(out(0)._3 == 2000000L)
    assert(out(1)._3 >= out(2)._3) // farthest-point gains non-increasing
  }
}
