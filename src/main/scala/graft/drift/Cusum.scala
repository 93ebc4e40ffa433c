package graft.drift

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** CUSUM changepoint detection (Page 1954) — the SEQUENTIAL drift
  * monitor next to the distributional ones ([[Drift.psi]]/KS/divergence
  * compare two snapshots; CUSUM finds WHEN a level shift happened inside
  * one ordered series, and reacts to small persistent shifts faster than
  * any fixed-window mean): per series, the one-sided statistics
  *
  *   C⁺_i = max(0, C⁺_{i−1} + (x_i − target − slack))
  *   C⁻_i = max(0, C⁻_{i−1} + (target − slack − x_i))
  *
  * with an alarm when either exceeds the threshold.
  *
  * Spark-first: the recursion LOOKS unexpressible in SQL, but the classic
  * prefix-sum closed form makes it one window pass —
  * C⁺_i = P_i − min(0, min_{j≤i} P_j) where P is the running sum of
  * (x − target − slack) — so the whole operator is two running sums +
  * two running mins over one per-series sort, no recursion, no UDF.
  *
  * Cross-engine exactness: values carry ≤ 4 semantic decimals (the
  * Q.money contract) and target/slack/threshold must be 4dp-representable
  * (enforced), so EVERY quantity — deviations, prefix sums, running mins,
  * the statistics, the alarm compare — lives in exact DECIMAL arithmetic;
  * there is no float anywhere in the statistic. The oracle replays the
  * closed form verbatim.
  *
  * 100 TB posture: one hash exchange per series (all four window
  * functions share the (series, order) sort), state is the window
  * frame's running scalars.
  */
object Cusum {

  private def dec4(x: Double, name: String) = {
    val v = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    require(v.toDouble == x, s"$name must be 4dp-representable, got $x")
    v
  }

  /** Per-row CUSUM statistics over each group's (orderCol, tieCol) order:
    * emits (groupCols, tieCol, value, cusum_up, cusum_down, alarm).
    * Null values are excluded from the series (they carry no evidence,
    * and a null deviation would poison every later prefix sum). */
  def detect(df: DataFrame, valueCol: String, orderCol: String,
             tieCol: String, groupCols: Seq[String],
             target: Double, slack: Double, threshold: Double): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val t = dec4(target, "target")
    val k = dec4(slack, "slack")
    val h = dec4(threshold, "threshold")
    val gs = groupCols.map(col)
    val ord = Seq(col(orderCol), col(tieCol))
    val run = Window.partitionBy(gs: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val tDec = lit(t.toString).cast(DecimalType(18, 4))
    val kDec = lit(k.toString).cast(DecimalType(18, 4))
    val up = sum(col("_v") - tDec - kDec).over(run)
    val dn = sum(tDec - kDec - col("_v")).over(run)

    val base = df.where(col(valueCol).isNotNull)
      .select(gs ++ ord :+ col(valueCol).cast(DecimalType(18, 4)).as("_v"): _*)
      .withColumn("_pu", up)
      .withColumn("_pd", dn)
    val cu = col("_pu") - least(lit(0).cast(DecimalType(28, 4)), min("_pu").over(run))
    val cd = col("_pd") - least(lit(0).cast(DecimalType(28, 4)), min("_pd").over(run))
    val hDec = lit(h.toString).cast(DecimalType(18, 4))
    base
      .withColumn("cusum_up", cu.cast(DecimalType(28, 4)))
      .withColumn("cusum_down", cd.cast(DecimalType(28, 4)))
      .select(gs ++ ord :+
        graft.Num.dround(col("_v").cast("double"), 4).as("value") :+
        graft.Num.dround(col("cusum_up").cast("double"), 4).as("cusum_up") :+
        graft.Num.dround(col("cusum_down").cast("double"), 4).as("cusum_down") :+
        (col("cusum_up") > hDec || col("cusum_down") > hDec).as("alarm"): _*)
  }

  /** First alarm per series — the changepoint report: (groupCols, the
    * order/tie keys of the first alarming row, its statistics). Series
    * that never alarm are absent. */
  def changepoints(df: DataFrame, valueCol: String, orderCol: String,
                   tieCol: String, groupCols: Seq[String],
                   target: Double, slack: Double,
                   threshold: Double): DataFrame = {
    val det = detect(df, valueCol, orderCol, tieCol, groupCols,
      target, slack, threshold)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(orderCol), col(tieCol))
    det.where(col("alarm"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }
}
