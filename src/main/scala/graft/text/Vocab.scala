package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus vocabulary statistics: top-k terms with counts and cumulative
  * token coverage — the tokenizer-budget question ("how many word types
  * cover 90% of the corpus?").
  *
  * Scale shape: one keyed count with map-side combine (only (term, partial
  * count) shuffles), global top-k via sort-limit (per-partition
  * TakeOrdered, single merge), then the cumulative window runs over k rows
  * only — never over the full term dictionary. Coverage denominators come
  * from the same count pass, aggregated once.
  */
object Vocab {

  def coverage(docs: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("_gf_total"))
    val top = counts.orderBy(col("cnt").desc, col("term")).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
      .withColumn("cum_share",
        graft.Num.dround(
          sum(col("cnt")).over(w).cast(DoubleType) / col("_gf_total").cast(DoubleType), 6))
      .select("rank", "term", "cnt", "cum_share")
  }

  /** Zipf rank-frequency audit: top-k terms with ln-rank/ln-count and the
    * least-squares slope of ln(cnt) ~ ln(rank) — natural language sits
    * near −1 (Zipf's law); a much flatter slope flags synthetic/templated
    * text, a much steeper one a degenerate vocabulary. The regression
    * runs on the k-row top frame only (one keyed count with map-side
    * combine feeds it; the windows never see the full dictionary).
    *
    * Cross-engine parity: ln is taken on identical double operands (the
    * LM-oracle precedent), each term is 10-dp-rounded before an exact
    * decimal window sum, and the closed-form slope
    * (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) is the same IEEE expression tree in
    * both engines. A degenerate fit (all ranks equal, k = 1) nulls the
    * slope rather than dividing by zero. */
  def zipf(docs: DataFrame, textCol: String, k: Int = 20): DataFrame = {
    require(k >= 2, s"zipf needs k >= 2 ranks to fit a slope, got $k")
    val counts = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val top = counts.orderBy(col("cnt").desc, col("term")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
    val x = graft.Num.dround(log(col("rank").cast(DoubleType)), 10)
    val y = graft.Num.dround(log(col("cnt").cast(DoubleType)), 10)
    val tot = Window.partitionBy(lit(1))
    def decSum(c: org.apache.spark.sql.Column) =
      sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 10))).over(tot)
        .cast(DoubleType)
    val withTerms = top
      .withColumn("ln_rank", x)
      .withColumn("ln_cnt", y)
      .withColumn("_gf_xy", graft.Num.dround(col("ln_rank") * col("ln_cnt"), 10))
      .withColumn("_gf_xx", graft.Num.dround(col("ln_rank") * col("ln_rank"), 10))
    val n = count(lit(1)).over(tot).cast(DoubleType)
    val sx = decSum(col("ln_rank")); val sy = decSum(col("ln_cnt"))
    val sxy = decSum(col("_gf_xy")); val sxx = decSum(col("_gf_xx"))
    val denom = n * sxx - sx * sx
    withTerms
      .withColumn("zipf_slope",
        when(denom =!= 0.0,
          graft.Num.dround((n * sxy - sx * sy) / denom, 6)))
      .select("rank", "term", "cnt", "ln_rank", "ln_cnt", "zipf_slope")
  }
}
