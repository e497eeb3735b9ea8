package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.NormalizeFunctions._

class NormalizeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "Cafe\u0301" // e + COMBINING ACUTE
  private val Composed = "Caf\u00e9" // precomposed e-acute

  test("nfc_normalize composes decomposed sequences and is null-safe") {
    val df = Seq(Some(Decomposed), Some(Composed), Some("plain"), None)
      .toDF("s")
    val out = df.select(nfc_normalize(col("s")).as("n")).as[Option[String]]
      .collect().toSeq
    assert(out == Seq(Some(Composed), Some(Composed), Some("plain"), None))
  }

  test("nfc_normalize works as a filter predicate (codegen path)") {
    val df = Seq(Decomposed).toDF("s")
    assert(df.filter(nfc_normalize(col("s")) === lit(Composed)).count() == 1)
  }

  test("clean_text: format char between spaces leaves one space; controls drop") {
    val dirty = "  ab \u200B c\t\tde  "
    val cleaned = Seq(dirty).toDF("s")
      .select(clean_text(col("s")).as("c")).as[String].head()
    assert(cleaned == "ab c de")
  }

  test("clean_text is idempotent") {
    val ugly = "x\u0301  y\u200Bz \r\n w"
    val once = Seq(ugly).toDF("s").select(clean_text(col("s")).as("c"))
      .as[String].head()
    val twice = Seq(once).toDF("s").select(clean_text(col("s")).as("c"))
      .as[String].head()
    assert(once == twice)
  }
}
