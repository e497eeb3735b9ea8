package graft.streaming

import graft.SparkSpec
import graft.ml.{OnnxExport, Scorer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType

/** The streaming neural op (st_stream_embed): the per-partition
  * [[Scorer.ExternalEmbedder]] is stateless, so the same embed+aggregate
  * pipeline must produce IDENTICAL results streamed across micro-batches
  * and run as one batch — checksummed through DECIMAL so aggregation
  * order cannot leak in.
  */
class StreamingEmbedSpec extends SparkSpec {
  import spark.implicits._

  private val path = "/tmp/graft_test_stream_embed.onnx"

  private def pipeline(df: DataFrame): DataFrame = {
    val emb = new Scorer.ExternalEmbedder(
      Scorer.onnxEmbedderFactory(path), Seq("f0", "f1"), dim = 2).score(df)
    emb.select(col("lang"),
        round(col("embedding")(0).cast("double"), 6).as("e0"),
        round(col("embedding")(1).cast("double"), 6).as("e1"))
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(col("e0").cast(DecimalType(18, 6))).cast("double").as("s0"),
        sum(col("e1").cast(DecimalType(18, 6))).cast("double").as("s1"))
  }

  test("streamed embed+aggregate equals the batch run across micro-batches") {
    OnnxExport.exportLinearMap(
      Array(Array(0.25, -0.5), Array(0.125, 0.375)),
      Array(0.0625, -0.125), Seq("f0", "f1"), path)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double, Double)]
    val sdf = input.toDF().toDF("id", "lang", "f0", "f1")
    val q = pipeline(sdf).writeStream.format("memory").queryName("st_emb")
      .outputMode(OutputMode.Complete()).start()
    val b1 = (1 to 40).map(i => (i.toLong, if (i % 3 == 0) "en" else "de",
      i * 0.125 - 2.0, (i % 7) * 0.25 - 0.75))
    val b2 = (41 to 90).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr",
      -i * 0.0625 + 1.0, (i % 5) * 0.5 - 1.0))
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      val streamed = spark.table("st_emb").collect().map(key).toSet
      val batch = pipeline((b1 ++ b2).toDF("id", "lang", "f0", "f1"))
        .collect().map(key).toSet
      assert(streamed == batch)
      assert(streamed.map(_._1) == Set("en", "de", "fr"))
    } finally q.stop()
  }
}
