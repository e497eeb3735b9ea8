package graft.store

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CorpusSinkSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 200L).map { i =>
    (i, if (i % 3 == 0) "en" else "de", s"doc $i")
  }.toDF("id", "lang", "text")

  test("write + reconcile: every shard ok, shard assignment deterministic") {
    val dir = Files.createTempDirectory("graft_sink").toString
    CorpusSink.write(corpus, dir, Seq("lang"), "id", nShards = 3, salt = "s")
    val rec = CorpusSink.reconcile(spark, dir, Seq("lang"), "id").collect()
    assert(rec.nonEmpty && rec.forall(_.getAs[Boolean]("ok")))
    // total rows survive the roundtrip
    assert(spark.read.parquet(dir).count() == 200)
    // re-write with the same salt lands every row in the same shard
    val dir2 = Files.createTempDirectory("graft_sink2").toString
    CorpusSink.write(corpus, dir2, Seq("lang"), "id", nShards = 3, salt = "s")
    val m1 = CorpusSink.manifest(spark, dir).orderBy("lang", "shard").collect().toSeq
    val m2 = CorpusSink.manifest(spark, dir2).orderBy("lang", "shard").collect().toSeq
    assert(m1 == m2)
  }

  test("orc format: identical layout and manifest, data survives byte-for-byte") {
    val dir = Files.createTempDirectory("graft_sink_orc").toString
    CorpusSink.write(corpus, dir, Seq("lang"), "id", nShards = 3, salt = "s",
      format = "orc")
    val rec = CorpusSink.reconcile(spark, dir, Seq("lang"), "id", format = "orc")
      .collect()
    assert(rec.nonEmpty && rec.forall(_.getAs[Boolean]("ok")))
    val back = spark.read.orc(dir)
    assert(back.count() == 200)
    // same rows, same shard assignment as the parquet sink (salt-keyed,
    // format-independent)
    val pdir = Files.createTempDirectory("graft_sink_orc_ref").toString
    CorpusSink.write(corpus, pdir, Seq("lang"), "id", nShards = 3, salt = "s")
    val a = back.select("id", "lang", "text", "shard")
      .orderBy("id").collect().toSeq
    val b = spark.read.parquet(pdir).select("id", "lang", "text", "shard")
      .orderBy("id").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      CorpusSink.write(corpus, dir, Seq("lang"), "id", nShards = 1, format = "csv")
    }
  }

  test("reconcile flags loss: deleting a shard directory surfaces ok=false") {
    val dir = Files.createTempDirectory("graft_sink3").toString
    CorpusSink.write(corpus, dir, Seq("lang"), "id", nShards = 2, salt = "s")
    // drop one shard's files out from under the manifest
    val victim = new java.io.File(s"$dir/lang=en/shard=0")
    assert(victim.exists)
    victim.listFiles().foreach(_.delete()); victim.delete()
    val rec = CorpusSink.reconcile(spark, dir, Seq("lang"), "id")
    val bad = rec.filter(!coalesce(col("ok"), lit(false))).collect()
    assert(bad.length == 1)
    assert(bad.head.getAs[String]("lang") == "en" &&
      bad.head.getAs[Number]("shard").longValue == 0L)
    assert(rec.filter(coalesce(col("ok"), lit(false))).count() == 3)
  }
}
