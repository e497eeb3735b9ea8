package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a NATIVE codegen'd Catalyst
  * expression — Spark ships no normalizer built-in, and a Scala UDF would
  * pay Row↔JVM encoding per cell in the hottest text-cleaning loop of a
  * corpus build. `doGenCode` emits a direct static call inside
  * whole-stage codegen; the fast path returns the input buffer untouched
  * when the string is already NFC (the overwhelming majority of real
  * text), so the expression allocates only on actual denormalized input.
  *
  * Parity: DuckDB's `nfc_normalize` (utf8proc) implements the same
  * Unicode NFC, so oracle replay is exact.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    NfcNormalize.norm(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NfcNormalize$$.MODULE$$.norm($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  def norm(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Deterministic text-cleaning surface for corpus normalization — the
  * canonical first pass of an LLM data pipeline (normalize before ANY
  * fingerprint/sketch/dedup, or the same visible text hashes to
  * different bytes).
  *
  * Every step is engine-portable by construction (shared Java-regex /
  * RE2 subset, explicit byte ranges instead of char-class intersections
  * RE2 lacks), so a DuckDB oracle replays the pipeline exactly.
  */
object NormalizeFunctions {

  /** `nfc_normalize(s)`: Unicode NFC canonical composition. */
  def nfc_normalize(c: Column): Column = columnOf(NfcNormalize(expressionOf(c)))

  /** Strips C0 controls + DEL — EXCEPT \t \n \x0B \x0C \r, which are
    * whitespace and belong to [[collapse_ws]] — and Unicode format chars
    * (Cf: zero-width space/joiners, BOM, bidi marks). */
  val StripControlRe = "[\\x00-\\x08\\x0e-\\x1f\\x7f\\p{Cf}]"

  def strip_control(c: Column): Column = regexp_replace(c, StripControlRe, "")

  /** Collapses ASCII whitespace runs to one space and trims. */
  def collapse_ws(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** The full cleaning chain: NFC → control/format strip → whitespace
    * collapse. Composition order matters and is part of the contract
    * (normalize first so combining marks survive; strip before collapse
    * so a format char between spaces leaves ONE space). */
  def clean_text(c: Column): Column = collapse_ws(strip_control(nfc_normalize(c)))
}
