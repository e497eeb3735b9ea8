package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.core.MinHash

/** Native MinHash-Jaccard scalar (J5) — operates on ArrayData in place (no
  * Seq conversion), and is a stable pattern for the optimizer rule below.
  */
case class MinHashJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "minhash_jaccard"
}

/** LSH band keys of a digest (same banding as SketchFunctions.minhash_bands). */
case class MinHashBandKeys(child: Expression, bands: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[ArrayData]
    val rowsPerBand = math.max(d.numElements() / bands, 1)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L
      var i = b * rowsPerBand
      val end = math.min(i + rowsPerBand, d.numElements())
      while (i < end) { h = 31 * h + d.getLong(i); i += 1 }
      out(b) = (b.toLong << 56) ^ (h & 0x00ffffffffffffffL)
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_band_keys"
}

/** Optimizer rule: rewrite a naive O(n·m) similarity join
  *
  *   `a CROSS/INNER JOIN b ON minhash_jaccard(a.mh, b.mh) >= τ [AND rest]`
  *
  * into an LSH-banded equi-join: explode band keys on both sides, equi-join
  * on the band key (shuffle tracks collisions, not n·m), de-duplicate the
  * multi-band collisions, and re-verify the original predicate. This is the
  * `minhash_jaccard(a,b) > τ` → banded pre-join strategy SURVEY §4 calls
  * out as the 100 TB path for similarity joins.
  *
  * Semantics note: results are DISTINCT over the joined rows (banding
  * collapses duplicate input rows that agree on every column) — the
  * standard set-semantics of candidate generation. τ must be ≥ minJaccard
  * (default 0.1): below that, banding with this band count has poor recall
  * and the rule leaves the plan untouched.
  */
case class SimilarityJoinRewrite(bands: Int = 20, minJaccard: Double = 0.1)
    extends Rule[LogicalPlan] {

  private object JaccardPredicate {
    /** Extract (leftDigest, rightDigest, threshold, remainder) */
    def unapply(e: Expression): Option[(Expression, Expression, Double)] = e match {
      case GreaterThanOrEqual(MinHashJaccard(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case GreaterThan(MinHashJaccard(a, b), Literal(t: Double, DoubleType)) => Some((a, b, t))
      case LessThanOrEqual(Literal(t: Double, DoubleType), MinHashJaccard(a, b)) => Some((a, b, t))
      case _ => None
    }
  }

  /** The verify predicate keeps the jaccard pattern, so an already-banded
    * join would re-match on the optimizer's next fixed-point pass and
    * explode recursively — detect our own band-key equality and skip.
    */
  private def alreadyBanded(cond: Expression): Boolean =
    splitConjuncts(cond).exists {
      case EqualTo(a: Attribute, b: Attribute) =>
        a.name == "__band_l" || b.name == "__band_r"
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner | Cross, Some(cond), hint) if !alreadyBanded(cond) =>
      val conjuncts = splitConjuncts(cond)
      conjuncts.collectFirst { case p @ JaccardPredicate(a, b, t) if t >= minJaccard => (p, a, b, t) } match {
        case Some((pred, a, b, _))
            if a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) =>
          rewrite(j, l, r, a, b, cond, hint)
        case Some((pred, a, b, _))
            if b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet) =>
          rewrite(j, l, r, b, a, cond, hint)
        case _ => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      digestL: Expression, digestR: Expression,
                      cond: Expression, hint: JoinHint): LogicalPlan = {
    def banded(side: LogicalPlan, digest: Expression, name: String): (LogicalPlan, Attribute) = {
      val gen = Explode(MinHashBandKeys(digest, bands))
      val attr = AttributeReference(name, LongType, nullable = false)()
      (Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(attr), child = side), attr)
    }
    val (lb, lAttr) = banded(l, digestL, "__band_l")
    val (rb, rAttr) = banded(r, digestR, "__band_r")
    val bandEq = EqualTo(lAttr, rAttr)
    val joined = Join(lb, rb, Inner, Some(And(bandEq, cond)), hint)
    val out = j.output
    // drop band columns, dedup multi-band collisions (set semantics).
    // Emitted as a group-by-all-columns Aggregate directly: the optimizer
    // batch that lowers Deduplicate has already run by the time
    // user-injected rules fire.
    Aggregate(out, out, Project(out, joined))
  }
}

/** Session extension installer:
  * `SparkSession.builder.withExtensions(GraftExtensions.install)` or conf
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions {
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => SimilarityJoinRewrite())
}
