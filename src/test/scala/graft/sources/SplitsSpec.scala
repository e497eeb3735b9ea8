package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import java.nio.file.Files

class SplitsSpec extends SparkSpec {

  test("pair-label file parses to long format with filename keys") {
    val dir = Files.createTempDirectory("graft_splits")
    val p = dir.resolve("labels.json")
    Files.writeString(p,
      """{"train": [{"table1": {"filename": "tables/a.csv"},
        |            "table2": {"filename": "tables/b.csv"}, "label": 1}],
        |  "valid": [{"table1": {"filename": "c.csv"},
        |            "table2": {"filename": "d.csv.bz2"}, "label": 0}],
        |  "test": []}""".stripMargin)
    val df = Splits.readPairLabels(spark, p.toString)
      .withColumn("k1", Splits.tableKey(col("table1")))
      .withColumn("k2", Splits.tableKey(col("table2")))
    val rows = df.collect().map(r => (r.getAs[String]("split"),
      r.getAs[String]("k1"), r.getAs[String]("k2"), r.getAs[Long]("label")))
    assert(rows.toSet == Set(("train", "a", "b", 1L), ("valid", "c", "d", 0L)))
  }

  test("pretrain split file parses (table, column) records") {
    val dir = Files.createTempDirectory("graft_splits2")
    val p = dir.resolve("split.json")
    Files.writeString(p,
      """{"train": [{"table": "x.csv", "metadata": "x.meta", "json": "h.json.bz2", "column": 3}],
        |  "valid": [], "test": [{"table": "y.csv", "metadata": "y.meta", "json": "g.json.bz2", "column": 0}]}""".stripMargin)
    val df = Splits.readPretrainSplit(spark, p.toString)
    assert(df.count() == 2)
    assert(df.filter(col("split") === "train").collect()(0).getAs[Long]("column") == 3)
  }

  test("seededShuffle is deterministic for a seed") {
    import spark.implicits._
    val df = (1 to 50).toDF("x")
    val a = Splits.seededShuffle(df, 7).collect().map(_.getInt(0))
    val b = Splits.seededShuffle(df, 7).collect().map(_.getInt(0))
    assert(a.sameElements(b))
    assert(!a.sameElements(1 to 50))
  }

  test("shuffleKey encodes nulls injectively: (null,x) and (x,null) differ") {
    // concat_ws alone SKIPS nulls, so both rows would hash the same string
    // "seedx" — the explicit null-flag encoding keeps the input
    // injective and matches a NULL-propagating oracle replay
    import spark.implicits._
    val df = Seq((Option("x"), Option.empty[String]),
      (Option.empty[String], Option("x"))).toDF("a", "b")
    val keys = df.select(Splits.shuffleKey(7L, Seq(col("a"), col("b"))))
      .collect().map(_.getString(0))
    assert(keys(0) != keys(1), "null position lost in shuffle key")
  }

  test("kFold: deterministic assignment, full coverage, rough balance") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("id")
    val a = Splits.kFold(ids, "id", 5).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("fold")).toMap
    val b = Splits.kFold(ids.repartition(13), "id", 5).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("fold")).toMap
    assert(a == b, "fold assignment must not depend on partitioning")
    assert(a.values.forall(f => f >= 0 && f < 5))
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.size == 5 && sizes.values.forall(s => s > 50 && s < 150))
    // a different salt reshuffles
    val c = Splits.kFold(ids, "id", 5, salt = "fold1").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("fold")).toMap
    assert(a != c)
  }
}
