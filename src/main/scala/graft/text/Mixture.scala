package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Training-mixture planning: per-source corpus composition and the
  * deterministic sampling rates that hit a target token budget under given
  * mixture weights — the "data recipe" step of an LLM pipeline (cf. the
  * published DoReMi / Pile / RefinedWeb mixture tables).
  *
  * One aggregation pass over (source → doc/token counts); everything after
  * is arithmetic on one row per source (dimension-sized, broadcastable).
  * The rates feed [[graft.ops.Sampling.weightedSample]] keyed per document
  * for the actual draw, keeping the whole path shuffle-free and
  * reproducible.
  */
object Mixture {

  /** Per-source mixture plan: document/token counts, the source's current
    * share of corpus tokens, and the sampling rate `min(1, budget·w /
    * tokens)` toward `budgetFrac` of total corpus tokens under uniform
    * weights (pass explicit weights by joining your own weight column —
    * rates compose multiplicatively).
    */
  def plan(docs: DataFrame, sourceCol: String, textCol: String,
           budgetFrac: Double = 0.5,
           tokenCount: Column => Column = TextAnalysis.tokenCount): DataFrame = {
    // `tokenCount` is the accounting lane: whitespace tokens by default
    // (oracle parity), or the trainer's REAL tokenizer via
    // graft.functions.BpeEncode (`t => size(bpeEncode(t, merges))`) so
    // the budget is denominated in the units the training run consumes —
    // the same seam Packing.packStatsBpe closes.
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac $budgetFrac not in (0,1]")
    val perSource = docs
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val totals = perSource.agg(
      sum(col("n_tokens")).as("_gf_total"),
      count(lit(1)).as("_gf_nsrc"))
    // zero guards: a source whose documents are all blank (n_tokens = 0)
    // must surface as rate 0, not as Infinity silently reported as 1.0 by
    // least(); likewise an all-blank corpus must give share 0, not NaN
    perSource.crossJoin(broadcast(totals))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        graft.Num.dround(
          when(col("_gf_total") === 0, lit(0.0)).otherwise(
            col("n_tokens").cast(DoubleType) / col("_gf_total").cast(DoubleType)), 6)
          .as("token_share"),
        graft.Num.dround(
          when(col("n_tokens") === 0, lit(0.0)).otherwise(
            least(lit(1.0),
              (lit(budgetFrac) * col("_gf_total").cast(DoubleType) /
                col("_gf_nsrc").cast(DoubleType)) / col("n_tokens").cast(DoubleType))), 6)
          .as("sample_rate"))
  }

  /** α-temperature mixture (the multilingual up-sampling recipe —
    * Conneau & Lample 2019 §3.1, XLM-R: q_i ∝ share_i^α): α < 1 flattens
    * the distribution, up-sampling low-resource sources; α = 1
    * degenerates to the natural token shares; α = 0 is uniform. Rates
    * target `budgetFrac` of total corpus tokens split by the tempered
    * weights: rate_i = min(1, budgetFrac·total·q_i / tokens_i).
    *
    * Same shape as [[plan]]: one corpus aggregation pass, then arithmetic
    * on the dimension-sized per-source frame (the α-sum is a second
    * aggregate over source rows, not corpus rows). Tempered weights go
    * through dround + exact-decimal summation so the plan hashes
    * identically cross-engine; `pow` is one libm call on an already-
    * rounded share (the ln-in-the-LM-oracle precedent). */
  def temperaturePlan(docs: DataFrame, sourceCol: String, textCol: String,
                      alpha: Double = 0.3,
                      budgetFrac: Double = 0.5,
                      tokenCount: Column => Column = TextAnalysis.tokenCount): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha $alpha not in [0,1]")
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac $budgetFrac not in (0,1]")
    val base = plan(docs, sourceCol, textCol, budgetFrac, tokenCount)
      .select("source", "n_docs", "n_tokens", "token_share")
    val tempered = base.withColumn("_gf_sa",
      graft.Num.dround(pow(col("token_share"), lit(alpha)), 8))
    val z = tempered.agg(
      sum(col("_gf_sa").cast(org.apache.spark.sql.types.DecimalType(38, 8)))
        .cast(DoubleType).as("_gf_z"),
      sum(col("n_tokens")).as("_gf_total"))
    tempered.crossJoin(broadcast(z))
      .withColumn("weight", graft.Num.dround(
        when(col("_gf_z") === 0, lit(0.0))
          .otherwise(col("_gf_sa") / col("_gf_z")), 6))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("token_share"),
        col("weight"),
        graft.Num.dround(
          when(col("n_tokens") === 0, lit(0.0)).otherwise(
            least(lit(1.0),
              lit(budgetFrac) * col("_gf_total").cast(DoubleType) * col("weight")
                / col("n_tokens").cast(DoubleType))), 6)
          .as("sample_rate"))
  }
}
