package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the constraint-validation layer a
  * lake profiler runs before admitting a table (public precedent:
  * Schelter et al., "Automating large-scale data quality verification",
  * VLDB 2018). Each rule yields one report row; row-local rules
  * (not-null / range / set / regex) all ride ONE aggregation pass over
  * the table — no per-rule scans — while uniqueness adds one groupBy
  * per checked column and referential integrity one left-anti count
  * against the (broadcastable) reference keys.
  *
  * All verdicts are exact integer counts; nothing floating anywhere.
  * Output: (rule, column, n_rows, n_violations, pass).
  */
object Checks {

  sealed trait Rule { def rule: String; def column: String }
  /** Null values violate. */
  final case class NotNull(column: String) extends Rule { val rule = "not_null" }
  /** Duplicated values violate (every row of a >1 group counts). */
  final case class Unique(column: String) extends Rule { val rule = "unique" }
  /** Non-null values outside [lo, hi] violate. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val rule = "in_range"
  }
  /** Non-null values not in the allowed set violate. */
  final case class InSet(column: String, allowed: Seq[String]) extends Rule {
    val rule = "in_set"
  }
  /** Non-null values with no regex match violate (anchor the pattern
    * for full-string semantics). */
  final case class MatchesRegex(column: String, pattern: String) extends Rule {
    val rule = "matches_regex"
  }
  /** Non-null values absent from `ref`'s `refColumn` violate (FK). */
  final case class RefIntegrity(column: String, ref: DataFrame,
                                refColumn: String) extends Rule {
    val rule = "ref_integrity"
  }

  private def rowLocalViolation(r: Rule): Option[Column] = r match {
    case NotNull(c) => Some(col(s"`$c`").isNull)
    case InRange(c, lo, hi) => Some(col(s"`$c`").isNotNull &&
      (col(s"`$c`") < lit(lo) || col(s"`$c`") > lit(hi)))
    case InSet(c, allowed) => Some(col(s"`$c`").isNotNull &&
      !col(s"`$c`").cast("string").isin(allowed: _*))
    case MatchesRegex(c, p) => Some(col(s"`$c`").isNotNull &&
      !col(s"`$c`").cast("string").rlike(p))
    case _ => None
  }

  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val local = rules.flatMap(r => rowLocalViolation(r).map(r -> _))
    val localReport: Option[DataFrame] =
      if (local.isEmpty) None
      else {
        val aggs = local.zipWithIndex.map { case ((_, v), i) =>
          sum(v.cast("long")).as(s"__v$i")
        } :+ count(lit(1)).as("__n")
        val one = df.agg(aggs.head, aggs.tail: _*)
        // ONE aggregated row exploded into per-rule report rows — a
        // union of per-rule selects would re-plan (and re-scan) the
        // aggregate once per rule (guarded by PlanShapeR8bSpec)
        Some(one.select(explode(array(local.zipWithIndex.map { case ((r, _), i) =>
            struct(lit(r.rule).as("rule"), lit(r.column).as("column"),
              col("__n").as("n_rows"), col(s"__v$i").as("n_violations"))
          }: _*)).as("__r"))
          .select(col("__r.rule").as("rule"), col("__r.column").as("column"),
            col("__r.n_rows").as("n_rows"),
            col("__r.n_violations").as("n_violations")))
      }
    val heavies = rules.collect {
      case Unique(c) =>
        val dups = df.groupBy(col(s"`$c`")).agg(count(lit(1)).as("__c"))
          .filter(col("__c") > 1)
          .agg(coalesce(sum(col("__c")), lit(0L)).as("n_violations"))
        df.agg(count(lit(1)).as("n_rows")).crossJoin(dups)
          .select(lit("unique").as("rule"), lit(c).as("column"),
            col("n_rows"), col("n_violations"))
      case RefIntegrity(c, ref, rc) =>
        val missing = df.filter(col(s"`$c`").isNotNull)
          .join(broadcast(ref.select(col(s"`$rc`").as(c)).distinct()),
            Seq(c), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        df.agg(count(lit(1)).as("n_rows")).crossJoin(missing)
          .select(lit("ref_integrity").as("rule"), lit(c).as("column"),
            col("n_rows"), col("n_violations"))
    }
    (localReport.toSeq ++ heavies).reduce(_ unionByName _)
      .withColumn("pass", col("n_violations") === 0)
  }
}
