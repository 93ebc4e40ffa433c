package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-proportion comparison with Wilson score intervals — the A/B gate
  * readout (did the new cleaning rule change the pass rate? is source
  * B's violation rate really higher than A's?): per group, both arms'
  * exact counts, the pooled two-proportion z statistic, and per-arm
  * Wilson intervals (the small-n-honest interval — a Wald ± z√(pq/n)
  * collapses to zero width at p̂ ∈ {0,1}; Wilson never does).
  *
  * Cross-engine exactness: counts are exact longs; every derived number
  * (rates, pooled z, Wilson bounds) is a fixed chain of IEEE ops —
  * divide/multiply/add/sqrt, all correctly-rounded primitives — on
  * identical operands with a LITERAL z quantile (the caller's, default
  * 1.96), dround'ed for output. The oracle replays the chains verbatim.
  *
  * Scale: one map-side-combined aggregation to groups×2 rows; the
  * statistics are arithmetic over that frame.
  */
object AbTest {

  private def wilson(p: Column, n: Column, z: Double, lower: Boolean): Column = {
    val z2 = z * z
    val center = p + lit(z2) / (lit(2.0) * n)
    val margin = lit(z) * sqrt((p * (lit(1.0) - p) + lit(z2) / (lit(4.0) * n)) / n)
    val denom = lit(1.0) + lit(z2) / n
    if (lower) (center - margin) / denom else (center + margin) / denom
  }

  /** Per-group readout: (groupCols, n_a, x_a, n_b, x_b, p_a, p_b, diff,
    * z_stat, a_lo, a_hi, b_lo, b_hi). `armCol` must hold exactly the
    * values "a"/"b" per row (map yours first); `flagCol` is the boolean
    * success. Groups missing an arm emit null statistics (no silent
    * one-armed comparisons). */
  def proportions(df: DataFrame, armCol: String, flagCol: String,
                  groupCols: Seq[String], z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val gs = groupCols.map(col)
    val agg = df
      .where(col(armCol).isin("a", "b") && col(flagCol).isNotNull)
      .groupBy(gs: _*)
      .agg(
        sum(when(col(armCol) === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col(armCol) === "a" && col(flagCol), 1L).otherwise(0L)).as("x_a"),
        sum(when(col(armCol) === "b", 1L).otherwise(0L)).as("n_b"),
        sum(when(col(armCol) === "b" && col(flagCol), 1L).otherwise(0L)).as("x_b"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("x_a").cast("double") / na
    val pb = col("x_b").cast("double") / nb
    val pp = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val se = sqrt(pp * (lit(1.0) - pp) * (lit(1.0) / na + lit(1.0) / nb))
    val ok = col("n_a") > 0 && col("n_b") > 0
    agg.select(gs :+ col("n_a") :+ col("x_a") :+ col("n_b") :+ col("x_b") :+
      when(col("n_a") > 0, graft.Num.dround(pa, 6)).as("p_a") :+
      when(col("n_b") > 0, graft.Num.dround(pb, 6)).as("p_b") :+
      when(ok, graft.Num.dround(pb - pa, 6)).as("diff") :+
      when(ok && se > 0, graft.Num.dround((pb - pa) / se, 4)).as("z_stat") :+
      when(col("n_a") > 0, graft.Num.dround(wilson(pa, na, z, lower = true), 6)).as("a_lo") :+
      when(col("n_a") > 0, graft.Num.dround(wilson(pa, na, z, lower = false), 6)).as("a_hi") :+
      when(col("n_b") > 0, graft.Num.dround(wilson(pb, nb, z, lower = true), 6)).as("b_lo") :+
      when(col("n_b") > 0, graft.Num.dround(wilson(pb, nb, z, lower = false), 6)).as("b_hi"): _*)
  }

  /** Mann–Whitney U / Wilcoxon rank-sum readout (Mann & Whitney 1947) —
    * the NONPARAMETRIC arm comparison for continuous metrics: no
    * normality assumption, immune to monotone transforms, robust to the
    * heavy tails that make t-style comparisons lie. Computed entirely
    * from the bounded VALUE HISTOGRAM (the [[graft.ops.Quantiles]]
    * discipline): per distinct value the two arms' counts, midrank
    * r_v = (2·cum − c + 1)/2 in exact HALVES, rank sum R_a = Σ n_a,v·r_v
    * as an exact decimal, U_a = R_a − n_a(n_a+1)/2, and the tie-corrected
    * normal approximation z = (U_a − n_a·n_b/2) / σ with
    * σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1))) — every input an exact
    * integer or half, the z a short IEEE chain on identical operands,
    * so the oracle replays it all. All-tied groups emit null z (σ = 0);
    * groups missing an arm emit null statistics.
    *
    * Scale: one histogram aggregation (≤ |domain| rows per group through
    * the exchange) + arithmetic on group-sized frames; the corpus never
    * sorts — the textbook rank test needs a global sort, this one
    * doesn't.
    *
    * Output: (groupCols…, n_a, n_b, u_a, u_b, z_stat). */
  def mannWhitney(df: DataFrame, armCol: String, valueCol: String,
                  groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val gs = groupCols.map(col)
    val hist = df
      .where(col(armCol).isin("a", "b") && col(valueCol).isNotNull)
      .select(gs :+ col(armCol).as("_arm") :+
        graft.Num.dec4(col(valueCol), valueCol).as("_v"): _*)
      .groupBy(gs :+ col("_v"): _*)
      .agg(sum(when(col("_arm") === "a", 1L).otherwise(0L)).as("_ca"),
        sum(when(col("_arm") === "b", 1L).otherwise(0L)).as("_cb"))
      .withColumn("_c", col("_ca") + col("_cb"))
    val w = Window.partitionBy(gs: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("_cum", sum("_c").over(w))
    // midrank in halves: 2·r_v = 2·cum − c + 1 (odd integer) — keep the
    // DOUBLED rank so everything stays in exact BIGINT arithmetic
    val r2 = lit(2) * col("_cum") - col("_c") + 1
    val agg = cum.groupBy(gs: _*).agg(
      sum(col("_ca")).as("n_a"), sum(col("_cb")).as("n_b"),
      sum(col("_ca") * r2).as("_ra2"), // 2·R_a, exact BIGINT
      sum(col("_c") * col("_c") * col("_c") - col("_c")).as("_ties"))
    val na = col("n_a"); val nb = col("n_b")
    val nn = na + nb
    val ok = na > 0 && nb > 0
    // U_a = R_a − n_a(n_a+1)/2, kept doubled: 2·U_a = 2R_a − n_a(n_a+1)
    val ua2 = col("_ra2") - na * (na + 1)
    val ub2 = lit(2) * na * nb - ua2
    val sigma2 =
      (na * nb).cast(DoubleType) / 12.0 *
        ((nn + 1).cast(DoubleType) -
          col("_ties").cast(DoubleType) / (nn * (nn - 1)).cast(DoubleType))
    val z = (ua2.cast(DoubleType) / 2.0 -
      (na * nb).cast(DoubleType) / 2.0) / sqrt(sigma2)
    agg.select(gs :+
      na.as("n_a") :+ nb.as("n_b") :+
      when(ok, ua2.cast(DoubleType) / 2.0).as("u_a") :+
      when(ok, ub2.cast(DoubleType) / 2.0).as("u_b") :+
      when(ok && sigma2 > 0, graft.Num.dround(z, 4)).as("z_stat"): _*)
  }

  /** DuckDB mirror of [[mannWhitney]] over `table(groupCol, arm, v)`
    * CTE-relation (arm ∈ {'a','b'}, v non-null DECIMAL(18,4)) — single
    * oracle owner for the histogram, doubled ranks, U, and z chains. */
  def sqlMannWhitney(rel: String, groupCol: String): String =
    s"""mwh AS (SELECT $groupCol, v,
              CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
              CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
            FROM $rel GROUP BY 1, 2),
       mwc AS (SELECT $groupCol, v, ca, cb, ca + cb AS c,
              sum(ca + cb) OVER (PARTITION BY $groupCol ORDER BY v) AS cum
            FROM mwh),
       mwa AS (SELECT $groupCol,
              CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
              CAST(sum(ca * (2 * cum - c + 1)) AS BIGINT) AS ra2,
              CAST(sum(c * c * c - c) AS BIGINT) AS ties
            FROM mwc GROUP BY 1),
       mwf AS (SELECT $groupCol, n_a, n_b,
              ra2 - n_a * (n_a + 1) AS ua2,
              2 * n_a * n_b - (ra2 - n_a * (n_a + 1)) AS ub2,
              CAST(n_a * n_b AS DOUBLE) / 12.0 *
                (CAST(n_a + n_b + 1 AS DOUBLE) -
                 CAST(ties AS DOUBLE) /
                   CAST((n_a + n_b) * (n_a + n_b - 1) AS DOUBLE)) AS sigma2
            FROM mwa)
       SELECT $groupCol, n_a, n_b,
              CASE WHEN n_a > 0 AND n_b > 0
                THEN CAST(ua2 AS DOUBLE) / 2.0 END AS u_a,
              CASE WHEN n_a > 0 AND n_b > 0
                THEN CAST(ub2 AS DOUBLE) / 2.0 END AS u_b,
              CASE WHEN n_a > 0 AND n_b > 0 AND sigma2 > 0
                THEN ${graft.queries.Q.sqlDround(
                  "(CAST(ua2 AS DOUBLE) / 2.0 - CAST(n_a * n_b AS DOUBLE) / 2.0) / sqrt(sigma2)", 4)}
              END AS z_stat
       FROM mwf"""

  /** CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    * WSDM 2013): adjust each user's post-period metric by their
    * PRE-period covariate — y′ = y − θ(x − x̄) with θ = S_xy / S_xx —
    * so arm means keep their expectation while the variance drops by
    * the squared correlation; the experiment detects the same effect
    * with far fewer users. The workhorse readout of every mature
    * experimentation platform.
    *
    * Contract: x = the user's pre-cutover mean of `valueCol`, y = the
    * post-cutover mean; users lacking either period are EXCLUDED (no
    * silent imputation — an imputed covariate contributes zero variance
    * reduction and hides telemetry gaps); arm = user id parity. A
    * constant covariate (S_xx = 0) emits null θ and the unadjusted
    * means — refusing adjustment, not the readout.
    *
    * Cross-engine exactness (every number replayed by the oracle): the
    * per-user means divide exact DECIMAL sums and dround to 6dp; the
    * centered moments dround each product to 8dp, accumulate as exact
    * DECIMAL(38,8), and round the total to 2dp BEFORE the one
    * decimal→double conversion (a numerator that small converts
    * identically everywhere — the Q.dsum rule); θ, adjusted means,
    * variances, and the reduction are then fixed IEEE chains on those
    * deterministic operands.
    *
    * Output (one row per arm, global columns repeated): (arm, n,
    * mean_y, mean_y_adj, n_users, theta, var_y, var_adj,
    * var_reduction).
    *
    * Scale: two user-keyed aggregations (map-side combined) + one-row
    * global frames broadcast back; nothing corpus-sized shuffles. */
  def cuped(events: DataFrame, userCol: String, tsCol: String,
            valueCol: String, cutoverUs: Long): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val e = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(graft.Num.longKey(col(userCol), userCol).as("u"),
        unix_micros(col(tsCol)).as("us"),
        graft.Num.dec4(col(valueCol), valueCol).as("v"))
    val pre = col("us") < cutoverUs
    val per0 = e.groupBy("u").agg(
      count(when(pre, 1)).as("n_pre"),
      graft.Num.dround(
        sum(when(pre, col("v"))).cast(DoubleType) / count(when(pre, 1)), 6)
        .as("x"),
      count(when(!pre, 1)).as("n_post"),
      graft.Num.dround(
        sum(when(!pre, col("v"))).cast(DoubleType) / count(when(!pre, 1)), 6)
        .as("y"))
    val per = per0.where(col("n_pre") > 0 && col("n_post") > 0)
      .select(col("u"),
        when(pmod(col("u"), lit(2)) === 0, "a").otherwise("b").as("arm"),
        col("x"), col("y"))
    val g = per.agg(
      count(lit(1)).as("n_users"),
      graft.Num.dround(
        sum(col("x").cast(DecimalType(38, 6))).cast(DoubleType) /
          count(lit(1)), 6).as("xbar"),
      graft.Num.dround(
        sum(col("y").cast(DecimalType(38, 6))).cast(DoubleType) /
          count(lit(1)), 6).as("ybar"))
    val wg = per.crossJoin(broadcast(g))
    val dx = col("x") - col("xbar")
    val dy = col("y") - col("ybar")
    def mom(c: Column): Column =
      round(sum(graft.Num.dround(c, 8).cast(DecimalType(38, 8))), 2)
        .cast(DoubleType)
    val moments = wg.agg(mom(dx * dy).as("sxy"), mom(dx * dx).as("sxx"),
      mom(dy * dy).as("syy"))
    val adj = wg.crossJoin(broadcast(moments))
      .withColumn("theta",
        when(col("sxx") > 0, graft.Num.dround(col("sxy") / col("sxx"), 6)))
      .withColumn("y_adj",
        when(col("theta").isNotNull,
          col("y") - col("theta") * (col("x") - col("xbar")))
          .otherwise(col("y")))
    val perArm = adj.groupBy("arm").agg(
      count(lit(1)).as("n"),
      graft.Num.dround(
        sum(col("y").cast(DecimalType(38, 6))).cast(DoubleType) /
          count(lit(1)), 6).as("mean_y"),
      graft.Num.dround(
        sum(graft.Num.dround(col("y_adj"), 6).cast(DecimalType(38, 6)))
          .cast(DoubleType) / count(lit(1)), 6).as("mean_y_adj"))
    val sAdj = adj
      .agg(mom((col("y_adj") - col("ybar")) * (col("y_adj") - col("ybar")))
        .as("s_adj"))
    val varY = graft.Num.dround(col("syy") / col("n_users"), 6)
    val varAdj = graft.Num.dround(col("s_adj") / col("n_users"), 6)
    perArm.crossJoin(broadcast(g.select("n_users")))
      .crossJoin(broadcast(moments))
      .crossJoin(broadcast(sAdj))
      .select(col("arm"), col("n"), col("mean_y"), col("mean_y_adj"),
        col("n_users"),
        when(col("sxx") > 0, graft.Num.dround(col("sxy") / col("sxx"), 6))
          .as("theta"),
        varY.as("var_y"), varAdj.as("var_adj"),
        when(varY > 0, graft.Num.dround(lit(1.0) - varAdj / varY, 6))
          .as("var_reduction"))
  }

  /** DuckDB fragment: the Wilson bound over rate expression `p` and
    * count `n` — the identical IEEE chain. */
  def sqlWilson(p: String, n: String, z: Double, lower: Boolean): String = {
    val z2 = z * z
    val center = s"($p + $z2 / (2.0 * $n))"
    val margin = s"($z * sqrt(($p * (1.0 - $p) + $z2 / (4.0 * $n)) / $n))"
    val op = if (lower) "-" else "+"
    s"(($center $op $margin) / (1.0 + $z2 / $n))"
  }
}
