package graft.operators

import graft.SparkSpec

class CentroidSpec extends SparkSpec {
  import spark.implicits._

  test("centroid cosines: aligned labels → 1, orthogonal labels → 0") {
    val embs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(2f, 0f), 0),   // label 0 along x
      (2L, Array(0f, 1f), 1), (3L, Array(0f, 3f), 1),   // label 1 along y
      (4L, Array(4f, 0f), 2))                           // label 2 along x
      .toDF("vec_id", "embedding", "label")
    val out = Ann.labelCentroidCosines(embs).collect()
      .map(r => (r.getAs[Long]("label_a"), r.getAs[Long]("label_b")) ->
        r.getAs[Double]("cosine")).toMap
    assert(out((0L, 1L)) == 0.0)
    assert(out((0L, 2L)) == 1.0)
    assert(out((1L, 2L)) == 0.0)
  }

  test("centroid cosines are partitioning-invariant (integer micro sums)") {
    val embs = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat / 13f),
        (i % 3).toInt)).toDF("vec_id", "embedding", "label")
    val a = Ann.labelCentroidCosines(embs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cosine")).toMap
    val b = Ann.labelCentroidCosines(embs.repartition(11)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cosine")).toMap
    assert(a == b)
  }

  test("contrastive pairs drop exactly every 5th token, deterministically") {
    val docs = Seq((1L, "a b c d e f g h i j k")).toDF("doc_id", "text")
    val out = graft.ingest.Augment.contrastivePairs(docs).collect().head
    assert(out.getAs[Long]("n_tokens") == 11L)
    assert(out.getAs[Long]("n_kept") == 9L) // drops positions 5 and 10
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c d f g h i k".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out.getAs[String]("positive_hash") == expected)
  }
}
