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
    // x = days since the GLOBAL corpus start (the ols convention), so
    // the intercept reads as "level at corpus start", not at epoch 0
    val daily = dailyMeans(df, tsCol, valueCol, groupCols)
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

  /** The shared (groupCols, _day, _yd) daily-mean frame — exact-decimal
    * means of the value at ≤4dp, 6dp-dround'd, days since the GLOBAL
    * corpus start. One map-side-combined aggregation; the frames every
    * series statistic here runs on are span-bounded. */
  private def dailyMeans(df: DataFrame, tsCol: String, valueCol: String,
                         groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val rows0 = df.where(col(tsCol).isNotNull && col(valueCol).isNotNull)
    val minDay = rows0.agg(
      min((unix_micros(col(tsCol)) / lit(UsPerDay)).cast("long")).as("_dmin"))
    rows0.crossJoin(broadcast(minDay))
      .select(gs :+ ((unix_micros(col(tsCol)) / lit(UsPerDay)).cast("long")
        - col("_dmin")).as("_day") :+
        col(valueCol).cast(DecimalType(14, 4)).as("_y"): _*)
      .groupBy(gs :+ col("_day"): _*)
      .agg(graft.Num.dround(
        sum(col("_y")).cast("double") / count(lit(1)), 6).as("_yd"))
  }

  /** Per-group Mann–Kendall trend test (Mann 1945; Kendall 1975) over
    * daily means — the nonparametric IS-there-a-trend companion of
    * [[theilSen]]'s HOW-steep: S = Σ_{i<j} sign(yd_j − yd_i) over all
    * day pairs, variance with the tie correction
    * Var = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, and the
    * continuity-corrected z = (S − sign(S))/√Var. S, the tie counts, and
    * both variance numerators are EXACT BIGINT arithmetic on the
    * 6dp-exact daily means (sign of a difference of exact decimals is
    * exact); only the /18 and the √ are float — IEEE-identical
    * everywhere. Output (groupCols…, n_days, s, var_s 6dp, z 6dp);
    * degenerate series (Var = 0) emit null z.
    *
    * 100 TB: the corpus collapses to (group, day) once; the pair join is
    * O(span²) — bounded by the time window, never data volume. */
  def mannKendall(df: DataFrame, tsCol: String, valueCol: String,
                  groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val gNames = groupCols
    val daily = dailyMeans(df, tsCol, valueCol, groupCols)
    val a = daily.select(gs :+ col("_day").as("_da") :+ col("_yd").as("_ya"): _*)
    val b = daily.select(gs :+ col("_day").as("_db") :+ col("_yd").as("_yb"): _*)
    val s = a.join(b, gNames).where(col("_da") < col("_db"))
      .select(gs :+ signum(col("_yb") - col("_ya")).cast("long").as("_sgn"): _*)
      .groupBy(gs: _*).agg(sum("_sgn").as("s"))
    val ties = daily
      .groupBy(gs :+ col("_yd"): _*).agg(count(lit(1)).as("_t"))
      .groupBy(gs: _*)
      .agg(sum(col("_t") * (col("_t") - 1) * (lit(2) * col("_t") + 5))
        .as("_corr"))
    val nd = daily.groupBy(gs: _*).agg(count(lit(1)).as("n_days"))
    val n = col("n_days")
    val varS = (n * (n - 1) * (lit(2) * n + 5) - col("_corr"))
      .cast("double") / 18.0
    // LEFT join on s: a single-day group yields no pair rows, but the
    // documented contract is that degenerate series surface as
    // (n_days=1, s=0, var_s=0, z=null) — not as omitted rows.
    nd.join(s, gNames, "left").join(ties, gNames)
      .select(gs :+ col("n_days") :+ coalesce(col("s"), lit(0L)).as("s") :+
        graft.Num.dround(varS, 6).as("var_s") :+
        when(varS > 0, graft.Num.dround(
          (col("s") - signum(col("s"))).cast("double") / sqrt(varS), 6))
          .as("z"): _*)
  }

  /** Per-group autocorrelation at lags 1…maxLag over daily means — the
    * seasonality/persistence readout next to the trend tests: acf(L) =
    * Σ e_t·e_{t+L} / Σ e_t² with e the 6dp-dround'd deviations from the
    * series mean. Products dround to 10dp and accumulate as exact
    * DECIMAL(38,10); one final divide. Missing days simply contribute no
    * pair (the lag join is on the day INDEX). Output (groupCols…, lag,
    * n_pairs, acf 6dp); a zero-variance series emits null acf.
    *
    * 100 TB: everything after the daily collapse is span×maxLag-bounded. */
  def acf(df: DataFrame, tsCol: String, valueCol: String,
          groupCols: Seq[String], maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val gs = groupCols.map(col)
    val gNames = groupCols
    val daily = dailyMeans(df, tsCol, valueCol, groupCols)
    val stats = daily.groupBy(gs: _*).agg(graft.Num.dround(
      sum(col("_yd").cast(DecimalType(38, 6))).cast("double") / count(lit(1)), 6)
      .as("_mu"))
    val centered = daily.join(broadcast(stats), gNames)
      .select(gs :+ col("_day") :+
        graft.Num.dround(col("_yd") - col("_mu"), 6).as("_e"): _*)
    val den = centered
      .select(gs :+ graft.Num.dround(col("_e") * col("_e"), 10).as("_p"): _*)
      .groupBy(gs: _*)
      .agg(sum(col("_p").cast(DecimalType(38, 10))).as("_den"))
    val lagged = centered
      .withColumn("lag", explode(array((1 to maxLag).map(lit): _*)))
    val future = centered.select(gs :+ col("_day").as("_dayb") :+
      col("_e").as("_eb"): _*)
    val num = lagged.join(future, gNames)
      .where(col("_dayb") === col("_day") + col("lag"))
      .select(gs :+ col("lag") :+
        graft.Num.dround(col("_e") * col("_eb"), 10).as("_p"): _*)
      .groupBy(gs :+ col("lag"): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_p").cast(DecimalType(38, 10))).as("_num"))
    num.join(broadcast(den), gNames)
      .select(gs :+ col("lag") :+ col("n_pairs") :+
        when(col("_den") > 0, graft.Num.dround(
          col("_num").cast("double") / col("_den").cast("double"), 6))
          .as("acf"): _*)
  }

  /** Per-group index of dispersion (Fano factor) of DAILY EVENT COUNTS —
    * the burstiness readout: fano = var/mean of the per-day count series;
    * ≈ 1 for Poisson-like traffic, ≫ 1 for bursty feeds (the "did this
    * source start arriving in clumps" anomaly signal next to the CUSUM
    * level monitor). Daily counts are exact longs; mean and the sample
    * variance ride the (Σc, Σc²) moments CAST to double (fixed IEEE op
    * order on exact integers — identical everywhere); n_days < 2 emits
    * null variance/fano. Output (groupCols…, n_days, total, mean 6dp,
    * variance 6dp, fano 6dp).
    *
    * 100 TB: the corpus collapses to (group, day) counts map-side; the
    * moment aggregation shuffles ≤ groups×span rows. */
  def dispersion(df: DataFrame, tsCol: String,
                 groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    val daily = df.where(col(tsCol).isNotNull)
      .select(gs :+ (unix_micros(col(tsCol)) / lit(UsPerDay)).cast("long")
        .as("_day"): _*)
      .groupBy(gs :+ col("_day"): _*)
      .agg(count(lit(1)).as("_c"))
    val agg = daily.groupBy(gs: _*).agg(
      count(lit(1)).as("n_days"),
      sum(col("_c")).as("_sc"),
      sum((col("_c") * col("_c")).cast(DecimalType(38, 0))).as("_scc"))
    val n = col("n_days").cast("double")
    val mean = col("_sc").cast("double") / n
    val variance = (col("_scc").cast("double") -
      col("_sc").cast("double") * col("_sc").cast("double") / n) / (n - 1)
    agg.select(gs :+ col("n_days") :+ col("_sc").as("total") :+
      graft.Num.dround(mean, 6).as("mean") :+
      when(col("n_days") >= 2, graft.Num.dround(variance, 6)).as("variance") :+
      when(col("n_days") >= 2 && col("_sc") > 0,
        graft.Num.dround(variance / mean, 6)).as("fano"): _*)
  }

  /** DuckDB mirror of [[dispersion]] over `table` grouped by `groupCol`. */
  def sqlDispersion(table: String, tsCol: String, groupCol: String): String =
    s"""dpd AS (SELECT $groupCol, epoch_us($tsCol) // $UsPerDay AS day,
              CAST(count(*) AS BIGINT) AS c
            FROM $table WHERE $tsCol IS NOT NULL GROUP BY 1, 2),
       dpa AS (SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_days,
                 CAST(sum(c) AS BIGINT) AS sc,
                 sum(CAST(c * c AS DECIMAL(38,0))) AS scc
               FROM dpd GROUP BY 1),
       dpf AS (SELECT $groupCol, n_days, sc,
                 CAST(sc AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
                 (CAST(scc AS DOUBLE) - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                    / CAST(n_days AS DOUBLE)) / (CAST(n_days AS DOUBLE) - 1)
                   AS variance
               FROM dpa)
       SELECT $groupCol, n_days, sc AS total,
              floor(mean * 1e6 + 0.5) / 1e6 AS mean,
              CASE WHEN n_days >= 2
                THEN floor(variance * 1e6 + 0.5) / 1e6 END AS variance,
              CASE WHEN n_days >= 2 AND sc > 0
                THEN floor(variance / mean * 1e6 + 0.5) / 1e6 END AS fano
       FROM dpf"""

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

  /** Shared daily-mean CTE chain (mirror of [[dailyMeans]]): ends in
    * `mkdaily(groupCol, day, yd)`. */
  private def sqlDaily(table: String, tsCol: String, valueCol: String,
                       groupCol: String): String =
    s"""mkd0 AS (SELECT $groupCol, epoch_us($tsCol) // $UsPerDay AS rawday,
              CAST($valueCol AS DECIMAL(14,4)) AS y
            FROM $table
            WHERE $tsCol IS NOT NULL AND $valueCol IS NOT NULL),
       mkmin AS (SELECT min(rawday) AS dmin FROM mkd0),
       mkdaily AS (SELECT $groupCol, rawday - dmin AS day,
              floor(CAST(sum(y) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6 AS yd
            FROM mkd0, mkmin GROUP BY 1, 2)"""

  /** DuckDB mirror of [[mannKendall]] over `table` grouped by
    * `groupCol` — daily means, the sign-pair sum, tie correction,
    * variance, and the continuity-corrected z all replayed. */
  def sqlMannKendall(table: String, tsCol: String, valueCol: String,
                     groupCol: String): String =
    s"""${sqlDaily(table, tsCol, valueCol, groupCol)},
       mks AS (SELECT a.$groupCol,
                 CAST(sum(CASE WHEN b.yd > a.yd THEN 1
                               WHEN b.yd < a.yd THEN -1 ELSE 0 END) AS BIGINT) AS s
               FROM mkdaily a JOIN mkdaily b
                 ON a.$groupCol = b.$groupCol AND a.day < b.day
               GROUP BY 1),
       mkties AS (SELECT $groupCol,
                    CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS corr
                  FROM (SELECT $groupCol, count(*) AS t
                        FROM mkdaily GROUP BY $groupCol, yd)
                  GROUP BY 1),
       mknd AS (SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_days
                FROM mkdaily GROUP BY 1),
       mkvar AS (SELECT n.$groupCol, n.n_days,
                   CAST(coalesce(s.s, 0) AS BIGINT) AS s,
                   CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                     - t.corr AS DOUBLE) / 18.0 AS var_s
                 FROM mknd n LEFT JOIN mks s USING ($groupCol)
                 JOIN mkties t USING ($groupCol))
       SELECT $groupCol, n_days, s,
              floor(var_s * 1e6 + 0.5) / 1e6 AS var_s,
              CASE WHEN var_s > 0 THEN
                floor(CAST(s - sign(s) AS DOUBLE) / sqrt(var_s) * 1e6 + 0.5) / 1e6
              END AS z
       FROM mkvar"""

  /** DuckDB mirror of [[acf]] at lags 1…maxLag over `table` grouped by
    * `groupCol`. */
  def sqlAcf(table: String, tsCol: String, valueCol: String,
             groupCol: String, maxLag: Int): String =
    s"""${sqlDaily(table, tsCol, valueCol, groupCol)},
       acmu AS (SELECT $groupCol,
                  floor(CAST(sum(CAST(yd AS DECIMAL(38,6))) AS DOUBLE)
                    / count(*) * 1e6 + 0.5) / 1e6 AS mu
                FROM mkdaily GROUP BY 1),
       acc AS (SELECT d.$groupCol, d.day,
                 floor((d.yd - m.mu) * 1e6 + 0.5) / 1e6 AS e
               FROM mkdaily d JOIN acmu m USING ($groupCol)),
       acden AS (SELECT $groupCol,
                   sum(CAST(floor(e * e * 1e10 + 0.5) / 1e10
                     AS DECIMAL(38,10))) AS den
                 FROM acc GROUP BY 1),
       acnum AS (SELECT a.$groupCol, l.lag,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   sum(CAST(floor(a.e * b.e * 1e10 + 0.5) / 1e10
                     AS DECIMAL(38,10))) AS num
                 FROM acc a
                 CROSS JOIN (SELECT unnest(generate_series(1, $maxLag)) AS lag) l
                 JOIN acc b ON b.$groupCol = a.$groupCol
                   AND b.day = a.day + l.lag
                 GROUP BY 1, 2)
       SELECT n.$groupCol, CAST(n.lag AS INT) AS lag, n.n_pairs,
              CASE WHEN d.den > 0 THEN
                floor(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE) * 1e6 + 0.5) / 1e6
              END AS acf
       FROM acnum n JOIN acden d USING ($groupCol)"""
}
