package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Poisson-bootstrap confidence intervals for grouped means (the
  * production one-pass bootstrap — Chamandy et al., "Estimating
  * uncertainty for massive data streams", Google 2012): instead of
  * resampling n rows B times (a shuffle per replicate), every row gets,
  * for each replicate b, an independent Poisson(1) weight — the large-n
  * limit of the multinomial resample count — so ALL B replicates are one
  * weighted aggregation over one pass of the data.
  *
  * Everything is deterministic and cross-engine exact:
  *
  *   - the per-(row, replicate) uniform draw is the engine's portable
  *     Knuth bucket (graft.ops.Sampling discipline) with its OWN fold
  *     prime and seed = seedBase + b, so draws are independent across
  *     replicates AND independent of every other sampler on the same key;
  *   - the Poisson(1) inverse CDF is an integer-threshold ladder on the
  *     [0, 1e6) bucket (cumP·10⁶ floored, capped at weight 9 ≈ the
  *     1 − 1.1e−6 tail) — pure BIGINT compares, no float anywhere;
  *   - replicate means use the exact-decimal accumulator (4dp-rounded
  *     contributions into DECIMAL(30,4), exact weighted sums, one final
  *     deterministic divide, 6dp dround);
  *   - the CI is an ORDER-STATISTIC interval: lo = the ceil(α·B)-th
  *     smallest replicate mean, hi = the mirror rank — integer rank
  *     selection, no quantile interpolation to diverge between engines.
  *
  * 100 TB posture: the replicate explosion (×B) feeds straight into a
  * partial aggregate, so the exchange carries ≤ groups·B rows per
  * partition — the corpus is read ONCE and never reshuffled; B bounds
  * memory, not data movement. This is why Poisson beats resampling at
  * scale: a true resample is B shuffles of the corpus.
  */
object Bootstrap {

  /** Own fold prime (CRT-independent of every Sampling selector). */
  val FoldPrime = 999999739L

  private val Knuth = 2654435761L
  private val Buckets = 1000000L

  /** floor(10⁶ · P(Poisson(1) ≤ k)) for k = 0..8; a bucket ≥ the last
    * threshold draws the capped weight 9. */
  val Poisson1Cum: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L,
      999989L, 999998L)

  /** The portable bucket with a COLUMN seed (replicate index): the
    * Sampling.bucket prime-fold arithmetic with seed = seedBase + b,
    * with the key PRE-FOLDED modulo the prime before the first multiply
    * — (residue + seed)·Knuth < 2.66e18 stays BIGINT-safe for ANY
    * non-negative key, where the raw Sampling shape overflows (loudly,
    * under ANSI) past keys ~3.4e9: the scale ladder's ×16 id band hit
    * exactly that. */
  def replicateBucket(key: Column, b: Column, seedBase: Long): Column = {
    val seed = lit(seedBase) + b.cast("long")
    val t = (pmod(key.cast("long"), lit(FoldPrime)) + seed) * lit(Knuth)
    pmod(pmod(pmod(t, lit(FoldPrime)) * (lit(Knuth) + lit(2L) * seed),
      lit(FoldPrime)), lit(Buckets))
  }

  /** Poisson(1) weight from a [0, 1e6) bucket: the integer-threshold
    * inverse-CDF ladder, built right-to-left so the FIRST threshold the
    * bucket is under wins (mirrors the SQL CASE 1:1). */
  def poissonWeight(bucket: Column): Column =
    Poisson1Cum.zipWithIndex.reverse.foldLeft(lit(Poisson1Cum.size.toLong)) {
      case (elseBranch, (thr, k)) =>
        when(bucket < thr, lit(k.toLong)).otherwise(elseBranch)
    }

  /** Per-group bootstrap CI for the mean of `valueCol`: one row per group
    * with (n_rows, observed_mean, ci_lo, ci_hi). Null values are skipped
    * (they join no replicate); a replicate whose weighted count is zero
    * for a group contributes no order statistic for it. */
  def ciMean(df: DataFrame, keyCol: String, valueCol: String,
             groupCols: Seq[String], replicates: Int = 64,
             seedBase: Long = 0L, alpha: Double = 0.025): DataFrame =
    ciCore(df.where(col(valueCol).isNotNull), keyCol,
      col(valueCol).cast(DecimalType(30, 4)),
      lit(1).cast(DecimalType(30, 4)),
      groupCols, replicates, seedBase, alpha, "observed_mean")

  /** Per-group bootstrap CI for a RATIO metric Σnum/Σden — the
    * production shape (pass rate per source, CTR, tokens-per-doc):
    * per replicate, both sides reweight by the SAME Poisson draw, so
    * the ratio's correlation structure is resampled correctly (a naive
    * per-side bootstrap destroys it). Rows where either side is null
    * are skipped; replicates with a zero weighted denominator drop. */
  def ciRatio(df: DataFrame, keyCol: String, numCol: String, denCol: String,
              groupCols: Seq[String], replicates: Int = 64,
              seedBase: Long = 0L, alpha: Double = 0.025): DataFrame =
    ciCore(df.where(col(numCol).isNotNull && col(denCol).isNotNull), keyCol,
      col(numCol).cast(DecimalType(30, 4)),
      col(denCol).cast(DecimalType(30, 4)),
      groupCols, replicates, seedBase, alpha, "observed_ratio")

  /** Shared replicate machinery: exact-decimal weighted Σnum/Σden per
    * replicate, order-statistic interval. `num`/`den` are decimal
    * expressions on the ≤ 4-semantic-decimal contract (the Q.money
    * discipline — a direct cast, never a per-row double rounding). */
  private def ciCore(rows: DataFrame, keyCol: String, num: Column, den: Column,
                     groupCols: Seq[String], replicates: Int,
                     seedBase: Long, alpha: Double,
                     observedName: String): DataFrame = {
    require(replicates >= 8 && replicates <= 1024,
      s"replicates must be in [8, 1024], got $replicates")
    require(alpha > 0.0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    require(seedBase >= 0 && seedBase + replicates < Sampling.MaxSeed,
      s"seedBase + replicates must stay below ${Sampling.MaxSeed}")
    Sampling.requireIntegralKey(rows, keyCol)
    val gs = groupCols.map(col)

    val base = rows.select(gs :+ col(keyCol).as("_key") :+
      num.as("_num") :+ den.as("_den"): _*)

    // Observed (full-data) ratio per group, exact-decimal.
    val observed = base.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_rows"),
        graft.Num.dround(
          sum("_num").cast("double") / sum("_den").cast("double"), 6)
          .as(observedName))

    // One pass × B replicates → partial-aggregated replicate ratios.
    val reps = base
      .select(gs :+ col("_key") :+ col("_num") :+ col("_den") :+
        explode(sequence(lit(0), lit(replicates - 1))).as("_b"): _*)
      .select(gs :+ col("_b") :+ col("_num") :+ col("_den") :+
        poissonWeight(replicateBucket(col("_key"), col("_b"), seedBase))
          .as("_w"): _*)
      .groupBy(gs :+ col("_b"): _*)
      .agg(sum(col("_num") * col("_w")).as("_sum"),
        sum(col("_den") * col("_w")).as("_n"))
      .where(col("_n") > 0)
      .select(gs :+ col("_b") :+
        graft.Num.dround(col("_sum").cast("double") / col("_n").cast("double"), 6)
          .as("_mean"): _*)

    // Order-statistic CI: lo rank ceil(alpha * B') over the group's B'
    // non-empty replicates, hi the mirror rank.
    val wAsc = Window.partitionBy(gs: _*).orderBy(col("_mean").asc, col("_b").asc)
    val ranked = reps
      .withColumn("_r", row_number().over(wAsc))
      .withColumn("_cnt", count(lit(1)).over(Window.partitionBy(gs: _*)))
      .withColumn("_lo_rank", ceil(lit(alpha) * col("_cnt")).cast("int"))
    val ci = ranked
      .where(col("_r") === col("_lo_rank") ||
        col("_r") === col("_cnt") + 1 - col("_lo_rank"))
      .groupBy(gs: _*)
      .agg(min("_mean").as("ci_lo"), max("_mean").as("ci_hi"),
        max("_cnt").as("n_replicates"))

    observed.join(ci, groupCols)
      .select(gs :+ col("n_rows") :+ col(observedName) :+
        col("ci_lo") :+ col("ci_hi") :+ col("n_replicates"): _*)
  }

  /** DuckDB fragment mirroring [[replicateBucket]] (`b` is the replicate
    * column). */
  def sqlReplicateBucket(key: String, b: String, seedBase: Long): String = {
    val seed = s"($seedBase + CAST($b AS BIGINT))"
    val kf = s"(((CAST($key AS BIGINT) % $FoldPrime) + $FoldPrime) % $FoldPrime)"
    val t = s"(($kf + $seed) * $Knuth)"
    s"((((($t % $FoldPrime) + $FoldPrime) % $FoldPrime) * " +
      s"($Knuth + 2 * $seed)) % $FoldPrime % $Buckets)"
  }

  /** DuckDB fragment mirroring [[poissonWeight]]. */
  def sqlPoissonWeight(bucket: String): String = {
    val whens = Poisson1Cum.zipWithIndex
      .map { case (thr, k) => s"WHEN $bucket < $thr THEN $k" }
      .mkString(" ")
    s"(CASE $whens ELSE ${Poisson1Cum.size} END)"
  }
}
