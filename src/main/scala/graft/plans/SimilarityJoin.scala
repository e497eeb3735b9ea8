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
  * standard set-semantics of candidate generation.
  *
  * Recall: rows-per-band is chosen PER THRESHOLD so that the collision
  * probability at τ is ≥ `recallTarget` (1−(1−τ^r)^(numPerm/r) ≥ target,
  * largest such r). Thresholds too low to reach the target even with
  * r=1 leave the plan untouched — the rule must not silently change
  * results.
  */
case class SimilarityJoinRewrite(numPerm: Int = 100, recallTarget: Double = 0.95)
    extends Rule[LogicalPlan] {

  /** Largest rows-per-band meeting the recall target at threshold t, or
    * None if even r=1 misses it (then banding would drop results). */
  private def chooseBands(t: Double): Option[Int] = {
    val r = (5 to 1 by -1).find { r =>
      val bands = numPerm / r
      1.0 - math.pow(1.0 - math.pow(t, r), bands) >= recallTarget
    }
    r.map(numPerm / _)
  }

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
      val matched = conjuncts.collectFirst {
        case p @ JaccardPredicate(a, b, t) => (p, a, b, chooseBands(t))
      }
      matched match {
        case Some((_, a, b, Some(bands)))
            if a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet) =>
          rewrite(j, l, r, a, b, cond, hint, bands)
        case Some((_, a, b, Some(bands)))
            if b.references.subsetOf(l.outputSet) && a.references.subsetOf(r.outputSet) =>
          rewrite(j, l, r, b, a, cond, hint, bands)
        case _ => j
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other     => Seq(other)
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      digestL: Expression, digestR: Expression,
                      cond: Expression, hint: JoinHint, bands: Int): LogicalPlan = {
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
