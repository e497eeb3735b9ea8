package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("rrf fuses two lists: shared ids sum both reciprocal contributions") {
    // list A ranks docs 1,2,3; list B ranks 3,2,9
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val b = Seq((3L, 1L), (2L, 2L), (9L, 3L)).toDF("doc_id", "rank")
    val out = Fusion.rrf(Seq(a, b), kConst = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    def c(rank: Int): Double =
      BigDecimal(1.0 / (60 + rank)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 3: rank 3 in A + rank 1 in B; doc 2: rank 2 twice
    val expected = Seq(
      (3L, c(3) + c(1), 2L, 1L),
      (2L, c(2) + c(2), 2L, 2L),
      (1L, c(1), 1L, 3L),
      (9L, c(3), 1L, 4L))
    assert(out.toSeq == expected)
  }

  test("rrf ties break on ascending id; topK truncates") {
    val a = Seq((5L, 1L), (4L, 1L)).toDF("doc_id", "rank") // same rank → same score
    val out = Fusion.rrf(Seq(a), kConst = 60, topK = 1).collect()
    assert(out.length == 1 && out(0).getLong(0) == 4L,
      "equal fused scores must keep the smaller id first")
  }

  test("rrf single list preserves the input order") {
    val a = Seq((8L, 1L), (2L, 2L), (6L, 3L)).toDF("doc_id", "rank")
    val got = Fusion.rrf(Seq(a), topK = 3).select("doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((8L, 1L), (2L, 2L), (6L, 3L)))
  }
}
