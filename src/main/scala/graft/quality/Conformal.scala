package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Split-conformal prediction intervals (Vovk et al. 2005; Papadopoulos
  * et al. 2002 — the distribution-free uncertainty wrapper): calibrate a
  * residual quantile on one half of the data, and the interval
  * prediction ± q̂ then covers a fresh point with probability ≥ 1 − α
  * for ANY underlying model, assuming only exchangeability — the
  * finite-sample-honest companion to the bootstrap (row 153 bounds a
  * MEAN; this bounds every individual prediction). For a quality-score
  * gate, this is "how wrong can this doc's score be", not "how wrong is
  * the average".
  *
  * The inner model here is the per-group calibration mean — deliberately
  * the simplest regressor, because the conformal machinery is
  * model-agnostic and the MACHINERY is what this operator contributes
  * (swap any scorer in; the quantile logic is unchanged).
  *
  * Everything is deterministic and cross-engine exact:
  *   - the calibration/evaluation split is the portable Knuth bucket
  *     under an OWN fold prime (CRT-independent of every other selector);
  *   - the model is the exact-decimal calibration mean, 4dp dround'ed;
  *   - q̂ is the residual at EXACT rank ceil((n_calib + 1)(1 − α)) — the
  *     finite-sample-valid rank (not a plug-in quantile), selected via
  *     row_number like the winsorize bounds (a data value, never an
  *     interpolation); α with (n+1)(1−α) > n refuses (the guarantee is
  *     unattainable — q̂ would be +∞);
  *   - coverage on the held-out half is an exact count ratio.
  *
  * Scale shape: one split filter on the scan, one map-side-combined mean,
  * one per-group residual sort (the window), broadcast-joined q̂, one
  * coverage aggregate. Corpus rows shuffle once (the residual rank).
  */
object Conformal {

  /** Own fold prime (CRT-independent of Sampling/Bootstrap selectors). */
  val SplitPrime = 999999733L

  /** Per-group conformal summary: (groupCols, n_calib, n_eval, model_mean,
    * qhat, width, coverage). Interval = model_mean ± qhat; coverage is
    * the held-out fraction inside — ≥ 1 − α in expectation under
    * exchangeability. */
  def intervals(df: DataFrame, keyCol: String, valueCol: String,
                groupCols: Seq[String], alpha: Double = 0.1,
                calibFraction: Double = 0.5, seed: Long = 0L): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(calibFraction > 0 && calibFraction < 1,
      s"calibFraction must be in (0,1), got $calibFraction")
    graft.ops.Sampling.requireIntegralKey(df, keyCol)
    val gs = groupCols.map(col)

    val rows = df.where(col(valueCol).isNotNull)
      .select(gs :+ col(keyCol).as("_key") :+
        col(valueCol).cast(DecimalType(18, 4)).as("_v"): _*)
      .withColumn("_calib",
        // the pre-folded bucket: BIGINT-safe for any non-negative key
        // (the scale ladder's x16 id band overflowed the legacy shape)
        graft.ops.Sampling.bucketFolded(col("_key"), seed, SplitPrime) <
          (calibFraction * graft.ops.Sampling.Buckets).toLong)

    val calib = rows.where(col("_calib"))
    val eval_ = rows.where(!col("_calib"))

    // Model: exact-decimal calibration mean (2dp-rounded sum before the
    // double cast — the decSum rule), 4dp.
    val model = calib.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_calib"),
        graft.Num.dround(
          round(sum(col("_v")), 2).cast("double") / count(lit(1)), 4)
          .as("model_mean"))

    // q̂ at the finite-sample rank over calibration residuals.
    val resid = calib.join(broadcast(model), groupCols)
      .withColumn("_r", abs(col("_v").cast("double") - col("model_mean")))
    val w = Window.partitionBy(gs: _*).orderBy(col("_r"), col("_key"))
    val ranked = resid.withColumn("_rn", row_number().over(w))
    val qhat = ranked
      .withColumn("_target",
        ceil(lit(1.0 - alpha) * (col("n_calib") + 1)).cast("long"))
      .where(col("_rn") === least(col("_target"), col("n_calib")))
      .withColumn("_attainable", col("_target") <= col("n_calib"))
      .select(gs :+ col("_r").as("qhat") :+ col("_attainable"): _*)

    // A group too small for the guarantee refuses loudly rather than
    // reporting an interval that silently undercovers.
    val checked = qhat.withColumn("qhat",
      when(col("_attainable"), col("qhat")).otherwise(raise_error(concat(
        lit("graft: conformal guarantee unattainable — need n_calib >= "),
        lit(s"(1-alpha)/alpha = ${(1 - alpha) / alpha} calibration rows")))))
      .drop("_attainable")

    val cov = eval_.join(broadcast(model), groupCols)
      .join(broadcast(checked), groupCols)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("n_eval"),
        max(col("model_mean")).as("model_mean"),
        graft.Num.dround(max(col("qhat")), 4).as("qhat"),
        graft.Num.dround(
          sum(when(abs(col("_v").cast("double") - col("model_mean")) <=
            col("qhat"), 1L).otherwise(0L)).cast("double") / count(lit(1)), 4)
          .as("coverage"))

    model.select(gs :+ col("n_calib"): _*).join(cov, groupCols)
      .select(gs :+ col("n_calib") :+ col("n_eval") :+
        graft.Num.dround(col("model_mean"), 4).as("model_mean") :+
        col("qhat") :+
        graft.Num.dround(col("qhat") * 2, 4).as("width") :+
        col("coverage"): _*)
  }
}
