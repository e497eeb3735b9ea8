package graft.operators

import graft.SparkSpec

/** Pins [[Sampling.domainReweight]] invariants: factor direction
  * follows excess sign, harder domains gain weight over their base
  * share, weights renormalize to 1e6 ppm (up to per-domain
  * truncation), and the integer pipeline is rerun-identical. */
class DomainReweightSpec extends SparkSpec {
  import spark.implicits._

  // domain "rep" is self-repetitive (low LM surprise), "mix" is not
  private val docs = Seq(
    (1L, "rep", "x x x x x x x x"), (2L, "rep", "x x x x x x x x"),
    (3L, "mix", "a b c d e f g h"), (4L, "mix", "h g f e d c b a"))
    .toDF("doc_id", "lang", "text")

  test("domainReweight: harder domain upweights, weights renormalize") {
    val out = Sampling.domainReweight(docs).collect()
      .map(r => r.getAs[String]("domain") -> r).toMap
    val rep = out("rep"); val mix = out("mix")
    assert(mix.getAs[Long]("excess_micro") > 0 &&
      rep.getAs[Long]("excess_micro") < 0)
    assert(mix.getAs[Long]("factor_ppm") > 1000000L &&
      rep.getAs[Long]("factor_ppm") < 1000000L)
    assert(mix.getAs[Long]("weight_ppm") > mix.getAs[Long]("base_ppm"))
    val tot = out.values.map(_.getAs[Long]("weight_ppm")).sum
    assert(tot <= 1000000L && tot > 1000000L - out.size, tot)
    // excess sums to ~0 by construction (bigram-weighted mean)
  }

  test("domainReweight: bit-identical across reruns and repartitions") {
    val a = Sampling.domainReweight(docs).orderBy("domain").collect().toSeq
    val b = Sampling.domainReweight(docs.repartition(7))
      .orderBy("domain").collect().toSeq
    assert(a == b)
  }
}
