package graft.profile

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added / removed / changed / unchanged columns") {
    val a = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "y", 3.0))
      .toDF("id", "tag", "v")
    val b = Seq((1L, "x", 10), (2L, "y", 20))
      .toDF("id", "tag", "n") // v removed, n added; id/tag row counts shift
    val out = SnapshotDiff.diff(a, b).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("id" -> "changed", "tag" -> "changed",
      "v" -> "removed", "n" -> "added"))
  }

  test("identical snapshots are unchanged; type swap is type_changed") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "k")
    assert(SnapshotDiff.diff(a, a).collect().forall(_.getString(1) == "unchanged"))
    val b = Seq((1L, 5.0), (2L, 6.0)).toDF("id", "k") // k: string → float
    val out = SnapshotDiff.diff(a, b).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("k") == "type_changed" && out("id") == "unchanged")
  }

  test("null-rate shift alone flags changed (same rows, same distinct)") {
    val a = Seq(Some(1.0), Some(2.0), Some(1.0)).toDF("v")
    val b = Seq(Some(1.0), Some(2.0), None).toDF("v")
    val row = SnapshotDiff.diff(a, b).collect().head
    assert(row.getString(1) == "changed")
    assert(row.getAs[Long]("nulls_a") == 0L && row.getAs[Long]("nulls_b") == 1L)
    // unique counts the null group, profile semantics: {1,2} vs {1,2,null}
    assert(row.getAs[Long]("uniq_a") == 2L && row.getAs[Long]("uniq_b") == 3L)
  }
}
