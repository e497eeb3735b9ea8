package graft.sources

import graft.SparkSpec

class CompactionPlanSpec extends SparkSpec {
  import spark.implicits._

  private def files = Seq(
    ("p1", 1L, 500L), // >= keep: untouched
    ("p1", 2L, 120L), ("p1", 3L, 80L), ("p1", 4L, 60L), ("p1", 5L, 90L),
    ("p2", 6L, 300L), ("p2", 7L, 10L)
  ).toDF("part", "id", "bytes")

  test("next-fit-decreasing packs small files; large files keep bin -1") {
    val plan = Layout.compactionPlan(files, "part", "id", "bytes",
        targetBytes = 200L, keepBytes = 400L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // p1 smalls sorted desc: 120(id2), 90(id5), 80(id3), 60(id4)
    //   bin0: 120 -> rem 80, 90 doesn't fit -> bin1: 90 -> rem 110,
    //   80 fits -> rem 30, 60 doesn't fit -> bin2
    assert(plan == Set(
      ("p1", -1L, 1L, 500L),
      ("p1", 0L, 2L, 120L),
      ("p1", 1L, 5L, 90L), ("p1", 1L, 3L, 80L),
      ("p1", 2L, 4L, 60L),
      ("p2", 0L, 6L, 300L), // 300 > target: its own bin, rem clamps to 0
      ("p2", 1L, 7L, 10L)))
  }

  test("empty partitions of small files yield only keep rows") {
    val big = Seq(("p", 1L, 999L)).toDF("part", "id", "bytes")
    val plan = Layout.compactionPlan(big, "part", "id", "bytes", 500L, 500L)
      .collect()
    assert(plan.length == 1 && plan.head.getLong(1) == -1L)
  }
}
