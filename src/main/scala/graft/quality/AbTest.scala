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
