package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** EXACT distributed quantiles without a global sort — the
  * value-histogram path: on the ≤ 4-decimal value contract the DISTINCT
  * value set is bounded by the value DOMAIN, not the row count (a
  * [0, 500] metric has ≤ 5M possible 4dp values no matter whether the
  * corpus holds 10⁵ or 10¹² rows), so one map-side-combined
  * groupBy-count collapses the corpus to a per-group histogram, and
  * every quantile is then a cumulative-sum rank lookup over that tiny
  * frame. Spark's own exact `percentile` buffers all values per group
  * (OOM at corpus scale) and `approx_percentile` is approximate; this
  * is exact AND bounded — the right construction whenever the metric is
  * fixed-precision, which curated-corpus metrics are.
  *
  * Rank rule: value at cumulative count ≥ ceil(p·n) — ANSI
  * PERCENTILE_DISC (a DATA VALUE, never an interpolation). The oracle
  * checks against DuckDB's own independent `quantile_disc`
  * implementation, not a mirror of this plan — the AsofJoin-style
  * stronger oracle.
  *
  * 100 TB: one partial-aggregated exchange of ≤ |domain| rows per
  * group, one histogram-sized window, the quantile probe set broadcast.
  */
object Quantiles {

  /** One row per (groupCols, p) with the exact discrete quantile of
    * `valueCol`. `ps` must be in (0, 1], distinct. Null values are
    * excluded; a group with no non-null values emits nothing. */
  def exact(df: DataFrame, valueCol: String, groupCols: Seq[String],
            ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantile probes must be in (0, 1], got $ps")
    require(ps.distinct.size == ps.size, s"duplicate probes in $ps")
    val gs = groupCols.map(col)
    val hist = df.where(col(valueCol).isNotNull)
      .select(gs :+ col(valueCol).cast(DecimalType(18, 4)).as("_v"): _*)
      .groupBy(gs :+ col("_v"): _*)
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(gs: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Window.partitionBy(gs: _*)
    val cum = hist
      .withColumn("_cum", sum("_c").over(w))
      .withColumn("_n", sum("_c").over(n))
    val probes = explode(array(ps.map(lit): _*)).as("p")
    cum.select(gs :+ col("_v") :+ col("_cum") :+ col("_n") :+ probes: _*)
      .where(col("_cum") >= ceil(col("p") * col("_n")))
      .groupBy(gs :+ col("p"): _*)
      .agg(graft.Num.dround(min("_v").cast("double"), 4).as("value"))
  }
}
