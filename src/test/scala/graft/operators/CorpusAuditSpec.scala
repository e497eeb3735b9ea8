package graft.operators

import graft.SparkSpec

class CorpusAuditSpec extends SparkSpec {
  import spark.implicits._

  test("zipf fit: a 1/r corpus scores slope near −1 with high r²") {
    // token k appears ⌊120/k⌋ times → near-perfect Zipf
    val text = (1 to 12).flatMap(k => Seq.fill(120 / k)(s"w$k")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq(text).toDF("text")).collect().head
    val slope = out.getAs[Double]("slope")
    assert(slope < -0.85 && slope > -1.15, s"slope $slope")
    assert(out.getAs[Double]("r2") > 0.97)
    assert(out.getAs[Long]("n_terms") == 12L)
  }

  test("zipf fit: a flat corpus scores slope near 0") {
    val text = (1 to 20).flatMap(k => Seq.fill(10)(s"w$k")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq(text).toDF("text")).collect().head
    assert(out.getAs[Double]("slope") == 0.0) // all freqs equal → ly constant
  }

  test("lsh quality: exact duplicates are found with perfect recall") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((0L, base), (1L, base), // dup pair
      (2L, (100 to 140).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.lshQualityReport(docs, threshold = 0.5).collect().head
    assert(out.getAs[Long]("n_true") == 1L)
    assert(out.getAs[Long]("n_hit") == 1L)
    assert(out.getAs[Double]("recall") == 1.0)
    assert(out.getAs[Double]("f1") > 0.0)
  }
}
