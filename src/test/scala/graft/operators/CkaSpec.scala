package graft.operators

import graft.SparkSpec

/** Pins [[Ann.linearCka]]: self-similarity = 1, (near-)invariance to
  * isotropic scaling, sensitivity to broken correspondence, and the
  * loud zero-variance guard. */
class CkaSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  private val base = Seq(
    1L -> Seq(0.9f, 0.1f, -0.3f), 2L -> Seq(-0.5f, 0.7f, 0.2f),
    3L -> Seq(0.2f, -0.8f, 0.6f), 4L -> Seq(-0.1f, 0.4f, -0.9f))

  private def cka(y: Seq[(Long, Seq[Float])]): Double =
    Ann.linearCka(emb(base), emb(y)).collect()(0).getAs[Double]("cka")

  test("CKA(X, X) = 1 and isotropic scaling preserves it") {
    assert(cka(base) == 1.0)
    assert(cka(base.map { case (i, v) => i -> v.map(_ * 2f) }) > 0.9999)
  }

  test("an independent view scores markedly below identity") {
    // deterministic splitmix64-mixed points (an LCG's nearby seeds
    // correlate): with n >> d the CKA of independent views
    // concentrates low, unlike tiny-n where any centered cloud looks
    // alike
    def mix(z0: Long): Long = {
      var z = z0 + -7046029254386353131L
      z = (z ^ (z >>> 30)) * -4658895280553007687L
      z = (z ^ (z >>> 27)) * -7723592293110705685L
      z ^ (z >>> 31)
    }
    def cloud(seed: Long) = (1L to 64L).map { i =>
      i -> (0 to 2).map(j =>
        ((mix(seed * 1000003 + i * 31 + j) >>> 33).toDouble
          / (1L << 31).toDouble - 0.5).toFloat)
    }
    val x = cloud(1L)
    val ck = Ann.linearCka(emb(x), emb(cloud(999L))).collect()(0).getAs[Double]("cka")
    assert(ck < 0.5, s"cka = $ck")
    assert(Ann.linearCka(emb(x), emb(x)).collect()(0).getAs[Double]("cka") == 1.0)
  }

  test("a zero-variance view raises loudly") {
    val flat = base.map { case (i, v) => i -> v.map(_ => 0.5f) }
    val ex = intercept[Exception] { cka(flat) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("zero-variance")))
  }
}
