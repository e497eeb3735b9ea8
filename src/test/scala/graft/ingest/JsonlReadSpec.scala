package graft.ingest

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class JsonlReadSpec extends SparkSpec {

  private def writeShards(): String = {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(dir.resolve("a.jsonl"),
      """{"id":1,"Title":"one","meta":{"lang":"en","score":10}}
        |{"id":2,"Title":"two"}
        |{"id":3,"Title": nope
        |
        |{"id":4,"Title":"four","meta":{"lang":"de","score":40}}
        |""".stripMargin)
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("b.jsonl.gz")))
    gz.write("""{"id":5,"Title":"five","meta":{"lang":"fr","score":50}}
               |""".stripMargin.getBytes("UTF-8"))
    gz.close()
    dir.toString
  }

  test("parses shards, flattens meta, sanitizes names, keeps corrupt evidence") {
    val df = JsonlRead.read(spark, writeShards())
    assert(df.columns.toSet ==
      Set("id", "title", "meta_lang", "meta_score", "corrupt_line", "src_file"))
    val clean = df.filter(col("corrupt_line").isNull)
    assert(clean.count() == 4) // blank line is not a record
    val bad = df.filter(col("corrupt_line").isNotNull).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("corrupt_line").contains("nope"))
    val r4 = clean.filter(col("id") === 4).collect().head
    assert(r4.getAs[String]("meta_lang") == "de" && r4.getAs[Long]("meta_score") == 40L)
    // missing meta flattens to nulls, not a dropped row
    assert(clean.filter(col("id") === 2 && col("meta_lang").isNull).count() == 1)
  }

  test("ingestReport accounts per shard; readClean drops corrupt lines") {
    val dir = writeShards()
    val rep = JsonlRead.ingestReport(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep("a.jsonl") == (3L, 1L))
    assert(rep("b.jsonl.gz") == (1L, 0L))
    assert(JsonlRead.readClean(spark, dir).count() == 4)
  }

  test("explicit schema skips inference and pins types") {
    val dir = writeShards()
    val sch = StructType(Seq(
      StructField("id", LongType), StructField("Title", StringType)))
    val df = JsonlRead.readClean(spark, dir, Some(sch))
    assert(df.columns.toSet == Set("id", "title", "src_file"))
    assert(df.agg(sum("id")).collect().head.getLong(0) == 12L)
  }
}
