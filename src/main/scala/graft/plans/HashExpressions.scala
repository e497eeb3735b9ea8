package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native `md5_low32`: little-endian uint32 of MD5 bytes [8,12) as
  * BIGINT — bit-identical to the former built-in chain
  * `conv(concat(substring(md5(c),23,2), …, substring(md5(c),17,2)), 16,
  * 10) cast long`, which per call allocated a MessageDigest, a 32-char
  * hex string, four UTF8String slices, a concat and a radix parse. The
  * hash sits under every sketch draw in the engine (MinHash slots, ICWS
  * gamma draws, CMS/HLL/KMV lanes, Bloom probes, bootstrap replicas,
  * split assignment), so the per-call constant multiplies by corpus ×
  * slots; this expression computes the same value with one thread-local
  * digest reuse and direct byte extraction, inside whole-stage codegen
  * (guide step 2 — per-task work, after the shuffle shape is right).
  *
  * DuckDB recomputes the identical value as
  * `md5_number_lower(v) & 4294967295` (the committed oracle SQL form).
  */
case class Md5Low32(child: Expression)
    extends UnaryExpression {
  // input is always binary: the SketchFunctions.md5_low32 wrapper casts
  // its (string) argument explicitly, mirroring the md5 built-in's
  // implicit string→binary UTF-8 cast
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_low32 requires binary input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Md5Low32.hash(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Low32.hash($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "md5_low32"
}

object Md5Low32 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** uint32 from digest bytes 8..11, little-endian, as a non-negative Long. */
  def hash(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(11) & 0xffL) << 24) | ((h(10) & 0xffL) << 16) |
      ((h(9) & 0xffL) << 8) | (h(8) & 0xffL)
  }
}
