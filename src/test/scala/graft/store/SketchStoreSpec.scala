package graft.store

import graft.SparkSpec
import graft.profile.Profiler
import java.nio.file.Files

class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (1 to 20).map(i => (i.toLong, s"v$i words here"))
    .toDF("id", "txt")

  test("parquet round-trip preserves profile rows and digests") {
    val dir = Files.createTempDirectory("graft_store").toString
    val prof = Profiler.profile(df, "t1")
      .unionByName(Profiler.profile(df, "t2"))
    SketchStore.writeParquet(prof, s"$dir/p")
    val back = SketchStore.readParquet(spark, s"$dir/p")
    assert(back.count() == 4)
    val d1 = back.filter($"table_name" === "t1" && $"col_name" === "txt")
      .select("minhash_exact").collect()(0).getAs[scala.collection.Seq[Long]](0)
    val d2 = prof.filter($"table_name" === "t1" && $"col_name" === "txt")
      .select("minhash_exact").collect()(0).getAs[scala.collection.Seq[Long]](0)
    assert(d1 == d2)
  }

  test("json.bz2 parity docs: one document per table with nested columns") {
    val dir = Files.createTempDirectory("graft_store_json").toString
    val prof = Profiler.profile(df, "t1")
    val snap = Profiler.contentSnapshot(df, "t1")
    SketchStore.writeJsonBz2(prof, snap, s"$dir/docs")
    val files = new java.io.File(s"$dir/docs").listFiles()
      .filter(_.getName.endsWith(".json.bz2"))
    assert(files.nonEmpty, "expected bz2 json part files")
    val doc = spark.read.json(s"$dir/docs").collect()(0)
    val meta = doc.getAs[org.apache.spark.sql.Row]("table_metadata")
    assert(meta.getAs[String]("file_name") == "t1")
    assert(meta.getAs[Long]("rows") == 20)
    // spark.read.json infers the columns map as a struct keyed by name
    val cols = doc.getAs[org.apache.spark.sql.Row]("columns")
    assert(cols.schema.fieldNames.toSet == Set("id", "txt"))
    assert(doc.getAs[scala.collection.Seq[Long]]("content_snapshot").length == 100)
  }
}
