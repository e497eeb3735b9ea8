package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Merge.upsert]] MERGE semantics: matched upsert/delete,
  * insert, absent-key delete no-op, latest-change-wins compaction, and
  * partitioning invariance.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val target = Seq(
    (1L, "a", 10L, 1.0), // will be updated
    (2L, "a", 11L, 2.0), // will be deleted
    (3L, "b", 12L, 3.0)  // untouched
  ).toDF("k", "grp", "seq", "v")

  private val changes = Seq(
    (1L, "a", 20L, 9.0, "upsert"),
    (1L, "a", 21L, 9.5, "upsert"), // later seq — must win
    (2L, "a", 22L, 0.0, "delete"),
    (4L, "b", 23L, 4.0, "upsert"), // insert
    (5L, "b", 24L, 0.0, "delete")  // delete of absent key: no-op
  ).toDF("k", "grp", "seq", "v", "op")

  test("merge resolves update, delete, insert, carry, and absent-delete") {
    val out = Merge.upsert(target, changes, Seq("k", "grp"), Seq("seq"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "a", 21L, 9.5),
      (3L, "b", 12L, 3.0),
      (4L, "b", 23L, 4.0)))
  }

  test("output schema is exactly the target's") {
    val out = Merge.upsert(target, changes, Seq("k", "grp"), Seq("seq"))
    assert(out.columns.toSeq == target.columns.toSeq)
  }

  test("column ORDER is the target's even when keys are not leading") {
    val tgt = Seq((1.0, 1L, "a", 10L)).toDF("v", "k", "grp", "seq")
    val chg = Seq((9.0, 1L, "a", 20L, "upsert")).toDF("v", "k", "grp", "seq", "op")
    val out = Merge.upsert(tgt, chg, Seq("k", "grp"), Seq("seq"))
    assert(out.columns.toSeq == Seq("v", "k", "grp", "seq"))
    val r = out.collect().head
    assert(r.getDouble(0) == 9.0 && r.getLong(3) == 20L)
  }

  test("a NULL or unknown op fails the job instead of silently deleting") {
    val bad = Seq((1L, "a", 30L, 5.0, null.asInstanceOf[String]))
      .toDF("k", "grp", "seq", "v", "op")
    val ex = intercept[Exception] {
      Merge.upsert(target, bad, Seq("k", "grp"), Seq("seq")).collect()
    }
    assert(ex.getMessage.contains("unknown op") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown op")),
      ex.toString)
    val typo = Seq((1L, "a", 30L, 5.0, "Delete"))
      .toDF("k", "grp", "seq", "v", "op")
    intercept[Exception] {
      Merge.upsertLww(
        typo.limit(0), typo, Seq("k", "grp"), Seq("seq")).collect()
    }
  }

  test("partitioning-invariant") {
    val a = Merge.upsert(target, changes, Seq("k", "grp"), Seq("seq"))
      .orderBy("k", "grp").collect().toSeq
    val b = Merge.upsert(target.repartition(5), changes.repartition(3),
        Seq("k", "grp"), Seq("seq"))
      .orderBy("k", "grp").collect().toSeq
    assert(a == b)
  }

  test("upsertLww: commutative over any batch split, tombstones persist") {
    val empty = Seq.empty[(Long, String, Long, Double, String)]
      .toDF("k", "grp", "seq", "v", "op")
    val all = Seq(
      (1L, "a", 10L, 1.0, "upsert"),
      (1L, "a", 20L, 2.0, "upsert"),
      (2L, "a", 11L, 9.0, "upsert"),
      (2L, "a", 30L, 0.0, "delete"),
      (2L, "a", 25L, 8.0, "upsert"), // older than the delete — must stay dead
      (3L, "b", 12L, 3.0, "upsert")
    ).toDF("k", "grp", "seq", "v", "op")
    def fold(batches: Seq[org.apache.spark.sql.DataFrame]) =
      batches.foldLeft(empty)((st, b) =>
        Merge.upsertLww(st, b, Seq("k", "grp"), Seq("seq")))
    val oneShot = Merge.upsertLww(empty, all, Seq("k", "grp"), Seq("seq"))
    val splitA = fold(Seq(all.filter(col("seq") < 20), all.filter(col("seq") >= 20)))
    val splitB = fold(Seq(all.filter(col("seq") >= 20), all.filter(col("seq") < 20)))
    def live(df: org.apache.spark.sql.DataFrame) =
      Merge.liveView(df).orderBy("k").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    assert(live(oneShot) == Seq((1L, 20L, 2.0), (3L, 12L, 3.0)))
    assert(live(splitA) == live(oneShot))
    assert(live(splitB) == live(oneShot))
    // the tombstone row itself persists in state
    assert(oneShot.filter(col("k") === 2L && col("op") === "delete").count() == 1)
  }

  test("a delete earlier than a later upsert does not win") {
    val ch = Seq(
      (3L, "b", 30L, 0.0, "delete"),
      (3L, "b", 31L, 7.0, "upsert")
    ).toDF("k", "grp", "seq", "v", "op")
    val out = Merge.upsert(target, ch, Seq("k", "grp"), Seq("seq"))
      .filter(col("k") === 3L).collect()
    assert(out.length == 1 && out.head.getDouble(3) == 7.0)
  }
}
