package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Robust JSONL (newline-delimited JSON) corpus reader — the de-facto
  * interchange format of LLM training corpora (one document object per
  * line, usually gzipped in shards). The reference ingests CSV/Excel only
  * (`data_prep.py:67-78`); this is an engine extension in the same
  * ingest-hygiene family as [[RobustCsv]]: tolerate malformed lines,
  * account for them instead of failing, sanitize names, and surface
  * nested metadata as flat columns.
  *
  * Spark-first shape: a distributed TEXT scan + `from_json` per line.
  * Two deliberate choices over `spark.read.json`'s one-step path:
  *  - Spark refuses plans that prune a JSON scan down to only its
  *    internal corrupt-record column (SPARK-21610), which is exactly what
  *    a corrupt-count aggregation does; `from_json` over a text scan has
  *    no such restriction and parses in the SAME distributed pass.
  *  - the raw line text stays available for corrupt rows (quarantine
  *    files, re-parse audits) without re-reading the shard.
  * Schema still comes from Spark's JSON inference (one sampling pass);
  * production corpora with a known contract pass `schema` explicitly and
  * skip that pass entirely.
  *
  * Plain-text shards split by newline across executors, so a single huge
  * `.jsonl` still parallelizes. Gzip is NOT splittable (one task per
  * `.gz` shard): at 100 TB the corpus must arrive as many shards (the
  * universal practice — `xxx-00042-of-01024.jsonl.gz`), which parallelize
  * by file; the reader takes a glob/directory and leans on that.
  */
object JsonlRead {

  val CorruptCol = "_corrupt_record"

  /** Read a JSONL file/glob/directory with corrupt-line accounting.
    * Output columns: sanitized, one level of nested structs flattened to
    * `parent_child`, plus `src_file` (shard provenance — per-file stats
    * and incremental re-ingest key) and `corrupt_line` (the raw text of
    * an unparseable line, null for clean rows).
    */
  def read(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val dataSchema = StructType(
      schema.getOrElse(spark.read.json(path).schema)
        .fields.filterNot(_.name == CorruptCol))
    // PERMISSIVE from_json lands a malformed line's raw text in the
    // corrupt field and nulls the rest — one pass yields clean rows AND
    // the evidence for the per-shard corrupt count
    val parseSchema = StructType(dataSchema.fields :+ StructField(CorruptCol, StringType))
    val parsed = spark.read.textFile(path).toDF("line")
      .withColumn("src_file", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .filter(length(trim(col("line"))) > 0) // blank lines are not records
      .withColumn("j", from_json(col("line"), parseSchema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)))
    val flat = dataSchema.fields.toIndexedSeq.flatMap {
      case StructField(name, st: StructType, _, _) =>
        st.fields.toIndexedSeq.map { f =>
          (col(s"j.`$name`.`${f.name}`"), RobustCsv.sanitizeName(s"${name}_${f.name}"))
        }
      case f =>
        Seq((col(s"j.`${f.name}`"), RobustCsv.sanitizeName(f.name)))
    }
    val seen = scala.collection.mutable.Map.empty[String, Int]
    val cols = flat.map { case (c, n) =>
      val k = seen.getOrElse(n, 0)
      seen(n) = k + 1
      c.as(if (k == 0) n else s"${n}_$k")
    }
    parsed.select(cols :+ col(s"j.`$CorruptCol`").as("corrupt_line")
      :+ col("src_file"): _*)
  }

  /** Clean rows only (corrupt lines dropped) — the corpus-facing view. */
  def readClean(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame =
    read(spark, path, schema).filter(col("corrupt_line").isNull).drop("corrupt_line")

  /** Per-shard ingest report: (src_file, n_rows, n_corrupt). One pass,
    * one aggregation — at 100 TB this is the scan's audit trail.
    */
  def ingestReport(spark: SparkSession, path: String,
                   schema: Option[StructType] = None): DataFrame =
    read(spark, path, schema).groupBy("src_file").agg(
      sum(when(col("corrupt_line").isNull, 1L).otherwise(0L)).as("n_rows"),
      sum(when(col("corrupt_line").isNotNull, 1L).otherwise(0L)).as("n_corrupt"))
}
