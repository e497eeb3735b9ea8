package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the incremental face of `operators.Dedup`
  * (LLM-pipeline extension; the reference is batch-only).
  *
  * State discipline is the scale constraint: an unbounded `dropDuplicates`
  * keeps every fingerprint ever seen and eventually OOMs a 100 TB stream.
  * `dropDuplicatesWithinWatermark` bounds state to the watermark horizon —
  * the right contract for ingest dedup, where duplicates arrive close
  * together (re-delivered batches, crawler revisits).
  */
object StreamingDedup {

  /** Content fingerprint shared with the batch path: md5 over
    * U+0001-joined columns, U+0002 for nulls (same canonical form as
    * `Augment.contentHash` rows).
    */
  def fingerprint(cols: Seq[String]): org.apache.spark.sql.Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(col(s"`$c`").cast("string"), lit("\u0002"))): _*))

  /** Drop rows whose fingerprint already appeared within the watermark
    * horizon. `eventTimeCol` must be a timestamp column; `keyCols` default
    * to all columns except the event time.
    */
  def dedupStream(docs: DataFrame, eventTimeCol: String, watermark: String,
                  keyCols: Seq[String] = Nil): DataFrame = {
    val keys = if (keyCols.nonEmpty) keyCols
      else docs.columns.filterNot(_ == eventTimeCol).toSeq
    docs.withWatermark(eventTimeCol, watermark)
      .withColumn("__fp", fingerprint(keys))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
  }
}
