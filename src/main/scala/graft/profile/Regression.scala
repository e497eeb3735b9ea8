package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group simple linear regression from EXACT integer moments — the
  * relationship profiler ("does price scale with quantity, and equally
  * in every segment?"). One aggregation computes the five moment sums in
  * integer space (x in natural units, y micro-quantized to cents), so
  * they are partitioning-independent; slope, intercept, and r² are
  * closing double expressions over those integers.
  *
  * Overflow discipline: Σy² of cent-scale values can reach ~10¹⁸ and
  * stays in LONG, but n·Σy² cannot — that one product (and r²'s
  * denominator) is taken in DOUBLE from the exact long aggregates,
  * identical in any engine. Keep |x| ≲ 10⁴ and |y-cents| ≲ 10⁸ at ≲10⁷
  * rows per group, or pre-scale.
  */
object Regression {

  /** Output: one row per group —
    * (group, n, slope, intercept, r2): y_cents ≈ slope·x + intercept. */
  def groupedOls(df: DataFrame, groupCol: String, xCol: String,
                 yCol: String): DataFrame = {
    val x = round(col(s"`$xCol`"), 0).cast("long")
    val y = round(col(s"`$yCol`") * 100, 0).cast("long")
    df.select(col(s"`$groupCol`").as("group"), x.as("x"), y.as("y"))
      .groupBy("group")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("__num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("__dx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("__dy", // n·Σy² overflows long: double from exact longs
        col("n").cast("double") * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double"))
      .select(col("group"), col("n"),
        when(col("__dx") === 0, lit(0.0))
          .otherwise(round(col("__num").cast("double") /
            col("__dx").cast("double"), 6)).as("slope"),
        when(col("__dx") === 0, lit(0.0))
          .otherwise(round(
            (col("sy").cast("double") -
              col("__num").cast("double") / col("__dx").cast("double") *
                col("sx").cast("double")) / col("n").cast("double"), 6))
          .as("intercept"),
        when(col("__dx") === 0 || col("__dy") === 0, lit(0.0))
          .otherwise(round(
            col("__num").cast("double") * col("__num").cast("double") /
              (col("__dx").cast("double") * col("__dy")), 6)).as("r2"))
  }
}
