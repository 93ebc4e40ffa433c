package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.Num.dround

/** Gate-evaluation metrics: grade a quality gate's SCORE against labels.
  *
  * The engine ships a stack of curation gates (composite quality, Gopher,
  * LM perplexity, fastText, DSIR — SURVEY §2 rows 53/109/113/117/124) but
  * until now no way to measure how well any of them separates good from
  * bad data. These are the standard classifier-evaluation operators —
  * ROC-AUC, a precision/recall threshold sweep, a calibration
  * (reliability) table, and inter-gate Cohen's kappa — extending the
  * reference's validation-summary spirit (validate_data.py's row-coverage
  * rates) to scored gates.
  *
  * Scale shape: every operator first collapses the corpus to a
  * DISTINCT-SCORE frame (scores are 4-dp-rounded, so the support is
  * ≤ 10⁴ rows regardless of corpus size) with one map-side-combined
  * aggregation; ranking/threshold windows then run on that bounded frame.
  * No corpus-wide sort, no per-row window — the only corpus-sized
  * exchange is the keyed partial-count shuffle.
  *
  * Float parity: ranks and counts are integers/half-integers (exact in
  * both engines), rank-sum accumulates as DECIMAL, and every emitted
  * ratio is a single IEEE division of identical operands followed by
  * [[graft.Num.dround]] — bit-identical across engines and partitionings.
  */
object GateEval {

  /** Distinct-score frame: one row per score value with `n` rows and
    * `npos` positives. The bounded relation every metric runs on.
    * NULL scores are dropped at the scan (matching `gains`): an unscored
    * row has no rank — kept, it would sort engine-dependently in the AUC
    * window (Spark nulls-first vs DuckDB nulls-last) and land on an
    * arbitrary side of every prCurve threshold. */
  private def byScore(df: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) > 0, 1L).otherwise(0L)).as("npos"))

  /** ROC-AUC via the Mann-Whitney rank-sum with average-rank tie
    * handling: AUC = (Σ_pos avgrank − P(P+1)/2) / (P·N). One row:
    * (n_pos, n_neg, auc). Ties get rank `before + (n+1)/2` — exact
    * half-integers; the rank-sum and the P(P+1)/2 correction accumulate
    * as exact DECIMAL (the correction in decimal arithmetic, NOT a long
    * divide — Spark's `/` on longs is double division, which rounds past
    * 2⁵³ and the long product wraps past 3×10⁹ positives), and the final
    * division is one IEEE op on double-cast counts. A single-class input
    * (no positives or no negatives) yields NULL — AUC is undefined, and
    * a silent engine-specific NaN/NULL divergence would otherwise leak
    * into the oracle compare. */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = byScore(df, scoreCol, labelCol)
    // The window runs on the distinct-score frame (bounded support) —
    // single-partition by construction, ≤ 10^(dp) rows.
    val w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = g.withColumn("before", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("avgrank",
        col("before").cast(DoubleType) + (col("n").cast(DoubleType) + 1.0) / 2.0)
    val pD = col("p").cast(DecimalType(38, 0))
    val correction = (pD * (pD + lit(1)) / lit(2)).cast(DecimalType(38, 1))
    ranked.agg(
        sum(col("npos")).as("p"),
        sum(col("n") - col("npos")).as("q"),
        sum((col("npos").cast(DoubleType) * col("avgrank"))
          .cast(DecimalType(38, 1))).as("ranksum"))
      .select(
        col("p").as("n_pos"), col("q").as("n_neg"),
        when(col("p") > 0 && col("q") > 0,
          dround(
            (col("ranksum") - correction).cast(DoubleType)
              / (col("p").cast(DoubleType) * col("q").cast(DoubleType)), 6))
          .as("auc"))
  }

  /** Precision/recall/F1 sweep over fixed thresholds (predicted-positive
    * = score ≥ t). One row per threshold: (threshold, tp, fp, fn, tn,
    * precision, recall, f1); empty prediction sets emit NULL ratios.
    * The distinct-score frame cross-joins the (tiny, broadcast)
    * threshold list, so the sweep costs thresholds × |support| rows. */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "prCurve needs at least one threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val g = byScore(df, scoreCol, labelCol)
    val t = broadcast(thresholds.toDF("threshold"))
    val prec = col("tp").cast(DoubleType) / (col("tp") + col("fp")).cast(DoubleType)
    val rec = col("tp").cast(DoubleType) / (col("tp") + col("fn")).cast(DoubleType)
    g.crossJoin(t)
      .groupBy("threshold")
      .agg(
        sum(when(col("score") >= col("threshold"), col("npos")).otherwise(0L)).as("tp"),
        sum(when(col("score") >= col("threshold"), col("n") - col("npos"))
          .otherwise(0L)).as("fp"),
        sum(when(col("score") < col("threshold"), col("npos")).otherwise(0L)).as("fn"),
        sum(when(col("score") < col("threshold"), col("n") - col("npos"))
          .otherwise(0L)).as("tn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0, dround(prec, 6)).as("precision"),
        when(col("tp") + col("fn") > 0, dround(rec, 6)).as("recall"),
        when(col("tp") + col("fp") > 0 && col("tp") + col("fn") > 0 && col("tp") > 0,
          dround(lit(2.0) * prec * rec / (prec + rec), 6))
          .when(col("tp") + col("fp") > 0 && col("tp") + col("fn") > 0, lit(0.0))
          .as("f1"))
  }

  /** Calibration (reliability) table over `bins` fixed-width buckets of a
    * [0,1] score: (bin, bin_lo, n, n_pos, mean_score, pos_rate). A
    * well-calibrated gate has mean_score ≈ pos_rate per bin. Scores are
    * 4-dp-rounded upstream, so the per-bin score sum is exact as
    * DECIMAL(38,4). */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int): DataFrame = {
    require(bins >= 2, s"calibration needs >= 2 bins, got $bins")
    val b = least(floor(col(scoreCol) * bins).cast(LongType), lit(bins - 1L))
    df.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(col(scoreCol).cast(DecimalType(38, 4))).as("ssum"))
      .select(col("bin"),
        dround(col("bin").cast(DoubleType) / bins, 4).as("bin_lo"),
        col("n"), col("n_pos"),
        dround(col("ssum").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("mean_score"),
        dround(col("n_pos").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("pos_rate"))
  }

  /** Cumulative gains / lift curve of a gate, on the BOUNDED
    * distinct-score frame (the [[auc]] discipline — scores are
    * 4-dp-rounded upstream, so ≤ 10⁴ groups; no corpus-wide row sort,
    * no ntile tie-splitting): for every distinct score, descending, the
    * cumulative population depth, the captured-positive gain, and
    * lift = gain/depth — the "read the top X% of the corpus by this
    * gate, keep what fraction of the good documents" table a curation
    * budget is set from. One keyed count with map-side combine; the
    * windows run over the bounded score frame only. All-negative or
    * empty sides null the gain/lift rather than reading as 0/0. */
  def gains(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    // null scores carry no rank: DuckDB and Spark disagree on default
    // null placement under DESC ordering, so a null score group would
    // hash engine-dependently — drop it at the scan, as TopK does
    val g = df.filter(col(scoreCol).isNotNull)
      .groupBy(col(scoreCol).as("score"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol) > 0, 1L).otherwise(0L)).as("n_pos"))
    val wCum = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(lit(1))
    val depthRaw = col("cum_n").cast(DoubleType) / col("tot_n").cast(DoubleType)
    val gainRaw = col("cum_pos").cast(DoubleType) / col("tot_pos").cast(DoubleType)
    g.withColumn("cum_n", sum("n").over(wCum))
      .withColumn("cum_pos", sum("n_pos").over(wCum))
      .withColumn("tot_n", sum("n").over(wTot))
      .withColumn("tot_pos", sum("n_pos").over(wTot))
      .select(col("score"), col("n"), col("n_pos"), col("cum_n"), col("cum_pos"),
        dround(depthRaw, 6).as("depth"),
        when(col("tot_pos") > 0, dround(gainRaw, 6)).as("gain"),
        when(col("tot_pos") > 0, dround(gainRaw / depthRaw, 6)).as("lift"))
  }

  /** Cohen's kappa between two BOOLEAN gate verdicts — chance-corrected
    * agreement (are two gates redundant, or does each catch different
    * data?). One pass, one row: the 2×2 confusion counts, observed
    * agreement p_o, chance agreement p_e, kappa. Count products stay
    * < 2⁵³ for any corpus this side of 9×10¹⁵ rows, so the double
    * arithmetic is exact until the final divisions. */
  def kappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol).cast("boolean")
    val b = col(bCol).cast("boolean")
    val agg = df.agg(
      sum(when(a && b, 1L).otherwise(0L)).as("both_pass"),
      sum(when(a && !b, 1L).otherwise(0L)).as("a_only"),
      sum(when(!a && b, 1L).otherwise(0L)).as("b_only"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("both_fail"))
    val n = (col("both_pass") + col("a_only") + col("b_only") + col("both_fail"))
      .cast(DoubleType)
    val po = (col("both_pass") + col("both_fail")).cast(DoubleType) / n
    val pe = ((col("both_pass") + col("a_only")) * (col("both_pass") + col("b_only"))
      + (col("both_fail") + col("b_only")) * (col("both_fail") + col("a_only")))
      .cast(DoubleType) / (n * n)
    agg.select(
      col("both_pass"), col("a_only"), col("b_only"), col("both_fail"),
      dround(po, 6).as("p_o"), dround(pe, 6).as("p_e"),
      when(lit(1.0) - pe =!= 0.0, dround((po - pe) / (lit(1.0) - pe), 6))
        .as("kappa"))
  }
}
