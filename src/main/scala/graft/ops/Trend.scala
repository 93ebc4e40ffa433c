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

  /** Per-group Theil–Sen robust trend over DAILY aggregates — the
    * breakdown-resistant complement of [[ols]] (Theil 1950; Sen 1968):
    * one wild day drags a least-squares slope anywhere, while the MEDIAN
    * of pairwise slopes shrugs off up to ~29% contamination. Per group:
    * exact-decimal daily means, ALL pairwise slopes between distinct
    * days — O(span²) pairs, bounded by the TIME WINDOW, never by data
    * volume (30 days = 435 pairs per group however many rows fed them) —
    * and the DISC median slope and intercept (median of per-day
    * residuals y − slope·day) selected by the cumulative-histogram rank
    * rule at 6dp: data values, no engine's quantile flavor in the loop.
    *
    * Output: (groupCols…, n_days, n_pairs, slope, intercept); single-day
    * groups emit n_pairs 0 with null slope/intercept.
    *
    * 100 TB: the corpus collapses to (group, day) rows in one map-side-
    * combined aggregation; everything after runs on span-bounded frames. */
  def theilSen(df: DataFrame, tsCol: String, valueCol: String,
               groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gs = groupCols.map(col)
    val gNames = groupCols
    val rows0 = df.where(col(tsCol).isNotNull && col(valueCol).isNotNull)
    // x = days since the GLOBAL corpus start (the ols convention), so
    // the intercept reads as "level at corpus start", not at epoch 0
    val minDay = rows0.agg(
      min((unix_micros(col(tsCol)) / lit(UsPerDay)).cast("long")).as("_dmin"))
    val daily = rows0.crossJoin(broadcast(minDay))
      .select(gs :+ ((unix_micros(col(tsCol)) / lit(UsPerDay)).cast("long")
        - col("_dmin")).as("_day") :+
        col(valueCol).cast(DecimalType(14, 4)).as("_y"): _*)
      .groupBy(gs :+ col("_day"): _*)
      .agg(graft.Num.dround(
        sum(col("_y")).cast("double") / count(lit(1)), 6).as("_yd"))
    def discMedian6(d: DataFrame, vCol: String, out: String): DataFrame = {
      val hist = d
        .groupBy(gs :+ col(vCol).cast(DecimalType(18, 6)).as("_v"): _*)
        .agg(count(lit(1)).as("_c"))
      val w = Window.partitionBy(gs: _*).orderBy(col("_v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val nw = Window.partitionBy(gs: _*)
      hist.withColumn("_cum", sum("_c").over(w))
        .withColumn("_n", sum("_c").over(nw))
        .groupBy(gs: _*)
        .agg(min(when(col("_cum") >= ceil(lit(0.5) * col("_n")), col("_v")))
          .cast("double").as(out))
    }
    val a = daily.select(gs :+ col("_day").as("_da") :+ col("_yd").as("_ya"): _*)
    val b = daily.select(gs :+ col("_day").as("_db") :+ col("_yd").as("_yb"): _*)
    val pairs = a.join(b, gNames).where(col("_da") < col("_db"))
      .select(gs :+ graft.Num.dround(
        (col("_yb") - col("_ya")) /
          (col("_db") - col("_da")).cast("double"), 6).as("_s"): _*)
    val nPairs = pairs.groupBy(gs: _*).agg(count(lit(1)).as("n_pairs"))
    val slope = discMedian6(pairs, "_s", "slope")
    val resid = daily.join(slope, gNames)
      .select(gs :+ graft.Num.dround(
        col("_yd") - col("slope") * col("_day").cast("double"), 6)
        .as("_r"): _*)
    val intercept = discMedian6(resid, "_r", "intercept")
    daily.groupBy(gs: _*).agg(count(lit(1)).as("n_days"))
      .join(nPairs, gNames, "left")
      .join(slope, gNames, "left")
      .join(intercept, gNames, "left")
      .select(gs :+ col("n_days") :+
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs") :+
        col("slope") :+ col("intercept"): _*)
  }

  /** DuckDB mirror of [[theilSen]] over `table`, grouped by `groupCol` —
    * daily means, the pair join, and both cumulative-histogram median
    * selections replayed. */
  def sqlTheilSen(table: String, tsCol: String, valueCol: String,
                  groupCol: String): String =
    s"""tsd0 AS (SELECT $groupCol, epoch_us($tsCol) // $UsPerDay AS rawday,
              CAST($valueCol AS DECIMAL(14,4)) AS y
            FROM $table
            WHERE $tsCol IS NOT NULL AND $valueCol IS NOT NULL),
       tsmin AS (SELECT min(rawday) AS dmin FROM tsd0),
       tsd AS (SELECT $groupCol, rawday - dmin AS day, y FROM tsd0, tsmin),
       tsdaily AS (SELECT $groupCol, day,
              floor(CAST(sum(y) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS yd
            FROM tsd GROUP BY 1, 2),
       tspairs AS (SELECT a.$groupCol,
              CAST(floor((b.yd - a.yd) / CAST(b.day - a.day AS DOUBLE)
                * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6)) AS s
            FROM tsdaily a JOIN tsdaily b
              ON a.$groupCol = b.$groupCol AND a.day < b.day),
       tsh1 AS (SELECT $groupCol, s, count(*) AS c FROM tspairs GROUP BY 1, 2),
       tsc1 AS (SELECT $groupCol, s,
              sum(c) OVER (PARTITION BY $groupCol ORDER BY s) AS cum,
              sum(c) OVER (PARTITION BY $groupCol) AS n
            FROM tsh1),
       tsslope AS (SELECT $groupCol,
              CAST(min(CASE WHEN cum >= ceil(CAST(0.5 AS DOUBLE) * n) THEN s END) AS DOUBLE)
                AS slope
            FROM tsc1 GROUP BY 1),
       tsres AS (SELECT d.$groupCol,
              CAST(floor((d.yd - sl.slope * CAST(d.day AS DOUBLE))
                * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6)) AS r
            FROM tsdaily d JOIN tsslope sl ON d.$groupCol = sl.$groupCol),
       tsh2 AS (SELECT $groupCol, r, count(*) AS c FROM tsres GROUP BY 1, 2),
       tsc2 AS (SELECT $groupCol, r,
              sum(c) OVER (PARTITION BY $groupCol ORDER BY r) AS cum,
              sum(c) OVER (PARTITION BY $groupCol) AS n
            FROM tsh2),
       tsint AS (SELECT $groupCol,
              CAST(min(CASE WHEN cum >= ceil(CAST(0.5 AS DOUBLE) * n) THEN r END) AS DOUBLE)
                AS intercept
            FROM tsc2 GROUP BY 1),
       tsnp AS (SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_pairs
            FROM tspairs GROUP BY 1),
       tsnd AS (SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_days
            FROM tsdaily GROUP BY 1)
       SELECT tsnd.$groupCol, n_days,
              coalesce(n_pairs, 0) AS n_pairs, slope, intercept
       FROM tsnd
       LEFT JOIN tsnp USING ($groupCol)
       LEFT JOIN tsslope USING ($groupCol)
       LEFT JOIN tsint USING ($groupCol)"""

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
