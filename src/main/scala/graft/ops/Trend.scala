package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Per-group OLS trend of a metric over time — the drift-over-time
  * monitor (is per-source quality DECAYING? is event value drifting
  * between snapshots?): closed-form simple linear regression per group,
  * slope/intercept/R² of y against days-since-corpus-start. The Zipf
  * slope's least-squares discipline generalized to a grouped operator.
  *
  * Cross-engine exactness: x is the µs timestamp offset from the GLOBAL
  * corpus minimum divided by 86 400e6 (one IEEE divide → days), 6dp
  * dround'ed; y carries ≤ 4 semantic decimals (the Q.money contract).
  * The five moment sums (Σx, Σy, Σx², Σxy, Σy²) accumulate as EXACT
  * decimals of the 6dp/4dp-rounded per-row terms (order-independent),
  * are rounded to 2dp BEFORE the double conversion (the Q.decSum rule —
  * a small-numerator decimal converts to double identically everywhere),
  * and the closed-form slope/intercept/R² are then a handful of IEEE ops
  * on identical operands. Slope precision loss from the 2dp sum rounding
  * is ~1e-11 relative — far below the 6dp output rounding.
  *
  * 100 TB posture: one global-min aggregate (1 row, broadcast) + one
  * map-side-combined moment aggregation — group rows never shuffle, only
  * the 5-sum state does. Degenerate groups (n < 2 or constant x) emit
  * null slope/intercept/r2 rather than dividing by zero.
  */
object Trend {

  private val UsPerDay = 86400000000L

  /** Per-group trend: (groupCols, n, slope, intercept, r2), slope in
    * y-units per day, 6dp. `tsCol` must be a timestamp; `valueCol` a
    * numeric with ≤ 4 semantic decimals. */
  def ols(df: DataFrame, tsCol: String, valueCol: String,
          groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val rows = df.where(col(tsCol).isNotNull && col(valueCol).isNotNull)
    val minTs = rows.agg(min(unix_micros(col(tsCol))).as("t0"))
    // Tight decimal widths keep every product under precision 38 in BOTH
    // engines — a capped-precision multiply silently RESCALES in Spark
    // (DecimalPrecision drops scale) but not in DuckDB, a hash-mismatch
    // class; DECIMAL(12,6)·DECIMAL(14,4) = (27,10) stays exact everywhere.
    val base = rows.crossJoin(broadcast(minTs))
      .select(gs :+
        graft.Num.dround(
          (unix_micros(col(tsCol)) - col("t0")).cast("double") / UsPerDay, 6)
          .as("x") :+
        col(valueCol).cast(DecimalType(14, 4)).as("y"): _*)
    val xd = col("x").cast(DecimalType(12, 6))
    val agg = base.groupBy(gs: _*).agg(
      count(lit(1)).as("n"),
      round(sum(xd), 2).cast("double").as("sx"),
      round(sum(col("y")), 2).cast("double").as("sy"),
      round(sum(xd * xd), 2).cast("double").as("sxx"),
      round(sum(xd * col("y")), 2).cast("double").as("sxy"),
      round(sum(col("y") * col("y")), 2).cast("double").as("syy"))
    val n = col("n").cast("double")
    val dx = n * col("sxx") - col("sx") * col("sx")
    val dy = n * col("syy") - col("sy") * col("sy")
    val num = n * col("sxy") - col("sx") * col("sy")
    val slope = graft.Num.dround(num / dx, 6)
    val intercept = graft.Num.dround(
      (col("sy") - slope * col("sx")) / n, 6)
    agg.select(gs :+ col("n") :+
      when(col("n") >= 2 && dx > 0, slope).as("slope") :+
      when(col("n") >= 2 && dx > 0, intercept).as("intercept") :+
      when(col("n") >= 2 && dx > 0 && dy > 0,
        graft.Num.dround(num * num / (dx * dy), 6)).as("r2"): _*)
  }

  /** DuckDB mirror of the whole trend over `table` (an events-shaped
    * relation with `tsCol` TIMESTAMP and `valueCol`), grouped by
    * `groupCol`. Single oracle owner. */
  def sqlOls(table: String, tsCol: String, valueCol: String,
             groupCol: String): String =
    s"""t0 AS (SELECT min(epoch_us($tsCol)) AS t0 FROM $table
             WHERE $tsCol IS NOT NULL AND $valueCol IS NOT NULL),
       pts AS (SELECT $groupCol,
                 CAST(floor(CAST(epoch_us($tsCol) - t0 AS DOUBLE) / $UsPerDay * 1e6 + 0.5) / 1e6
                   AS DECIMAL(12,6)) AS x,
                 CAST($valueCol AS DECIMAL(14,4)) AS y
               FROM $table, t0
               WHERE $tsCol IS NOT NULL AND $valueCol IS NOT NULL),
       sums AS (SELECT $groupCol, count(*) AS n,
                 CAST(round(sum(x), 2) AS DOUBLE) AS sx,
                 CAST(round(sum(y), 2) AS DOUBLE) AS sy,
                 CAST(round(sum(x * x), 2) AS DOUBLE) AS sxx,
                 CAST(round(sum(x * y), 2) AS DOUBLE) AS sxy,
                 CAST(round(sum(y * y), 2) AS DOUBLE) AS syy
               FROM pts GROUP BY 1),
       fit AS (SELECT $groupCol, n,
                 CAST(n AS DOUBLE) * sxx - sx * sx AS dx,
                 CAST(n AS DOUBLE) * syy - sy * sy AS dy,
                 CAST(n AS DOUBLE) * sxy - sx * sy AS num,
                 sx, sy FROM sums)
       SELECT $groupCol, n,
         CASE WHEN n >= 2 AND dx > 0
           THEN floor(num / dx * 1e6 + 0.5) / 1e6 END AS slope,
         CASE WHEN n >= 2 AND dx > 0
           THEN floor((sy - (floor(num / dx * 1e6 + 0.5) / 1e6) * sx)
             / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 END AS intercept,
         CASE WHEN n >= 2 AND dx > 0 AND dy > 0
           THEN floor(num * num / (dx * dy) * 1e6 + 0.5) / 1e6 END AS r2
       FROM fit"""
}
