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

  /** Top-k collocations by pointwise mutual information — the corpus
    * phrase-mining pass (boilerplate phrase discovery, multi-word-entity
    * spotting, tokenizer merge-candidate auditing):
    *
    *   PMI(x, y) = ln( p(x,y) / (p(x)·p(y)) ),
    *   p(x,y) = c(xy)/N₂, p(w) = c(w)/N₁
    *
    * with c(xy) adjacent-bigram counts (N₂ their total) and c(w) unigram
    * counts (N₁ their total). `minCount` floors the bigram count — PMI's
    * classic failure mode is rare-pair noise (a hapax bigram of two hapax
    * words maxes the score), the standard fix since Church & Hanks 1990.
    *
    * Scale shape: two keyed counts with map-side combine (only (gram,
    * partial count) pairs shuffle), the unigram side joined onto the
    * ≥-minCount bigram side twice (broadcast while it fits), top-k via
    * sort-limit. Cross-engine parity: the probability ratio is one IEEE
    * double expression over exact longs, 6-dp rounded BEFORE the ln and
    * re-rounded after (the ln-on-rounded-args oracle precedent). Ties
    * order by bigram text. */
  def collocations(docs: DataFrame, textCol: String, minCount: Long = 5,
                   k: Int = 50): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val uni = docs
      .select(explode(TextAnalysis.ngrams(col(textCol), 1)).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("_gf_cu"))
    val bi = docs
      .select(explode(TextAnalysis.ngrams(col(textCol), 2)).as("bigram"))
      .filter(length(col("bigram")) > 0)
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val totals = uni.agg(sum(col("_gf_cu")).as("_gf_n1"))
      .crossJoin(bi.agg(sum(col("cnt")).as("_gf_n2")))
    val parts = bi
      .withColumn("_gf_x", split(col("bigram"), " ").getItem(0))
      .withColumn("_gf_y", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("term").as("_gf_x"), col("_gf_cu").as("_gf_cx")), Seq("_gf_x"))
      .join(uni.select(col("term").as("_gf_y"), col("_gf_cu").as("_gf_cy")), Seq("_gf_y"))
      .crossJoin(broadcast(totals))
    val ratio = graft.Num.dround(
      (col("cnt").cast(DoubleType) / col("_gf_n2").cast(DoubleType)) /
        ((col("_gf_cx").cast(DoubleType) / col("_gf_n1").cast(DoubleType)) *
          (col("_gf_cy").cast(DoubleType) / col("_gf_n1").cast(DoubleType))), 6)
    parts
      .withColumn("pmi", graft.Num.dround(log(ratio), 6))
      .select(col("bigram"), col("cnt"), col("_gf_cx").as("cnt_x"),
        col("_gf_cy").as("cnt_y"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(k)
  }

  /** χ² keyword extraction per group (the classic feature-selection
    * statistic, Manning & Schütze §5.3.3): which terms CHARACTERIZE a
    * source against the rest of the corpus? Per (group, term) the 2×2
    * document contingency (in-group with/without the term vs out-group
    * with/without) scores χ² = N(ad − bc)² / ((a+b)(c+d)(a+c)(b+d));
    * the top-k per group are the group's signature vocabulary — the
    * mixture-debugging view ("what is source X actually full of?").
    *
    * Exactness: all eight contingency cells are exact longs from ONE
    * distinct-(doc, term) aggregation; χ² is a short IEEE chain on them
    * ((ad − bc) as a double product — the long product would overflow
    * past ~3e9 docs; documented), 6dp-dround'd; ties rank by term text.
    * `minDf` drops rare-term noise BEFORE the join (df-cap discipline).
    *
    * Scale: (doc, term) distinct pairs → one map-side-combined count per
    * (group, term); everything after is vocabulary-bounded.
    * Output: (group, term, df_in, df_out, chi2, rank ≤ k). */
  def keywordsChi2(docs: DataFrame, groupCol: String, textCol: String,
                   k: Int = 5, minDf: Long = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    // tokens are distinct per doc via array_distinct, so the groupBy
    // count IS the in-group document frequency
    val dfIn = docs.select(col(groupCol).as("_gf_g"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("_gf_g", "term").agg(count(lit(1)).as("df_in"))
    val dfTot = dfIn.groupBy("term").agg(sum("df_in").as("_gf_dft"))
      .filter(col("_gf_dft") >= minDf)
    val nG = docs.groupBy(col(groupCol).as("_gf_g"))
      .agg(count(lit(1)).as("_gf_ng"))
    val nTot = docs.agg(count(lit(1)).as("_gf_n"))
    val cells = dfIn.join(dfTot, Seq("term"))
      .join(nG, Seq("_gf_g"))
      .crossJoin(broadcast(nTot))
      .select(col("_gf_g"), col("term"), col("df_in"),
        (col("_gf_dft") - col("df_in")).as("df_out"),
        (col("_gf_ng") - col("df_in")).as("_gf_c"),
        (col("_gf_n") - col("_gf_ng") - (col("_gf_dft") - col("df_in")))
          .as("_gf_d"),
        col("_gf_n"))
    val a = col("df_in").cast(DoubleType); val b = col("df_out").cast(DoubleType)
    val c = col("_gf_c").cast(DoubleType); val d = col("_gf_d").cast(DoubleType)
    val num = (a * d - b * c)
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    val chi2 = when(den > 0, graft.Num.dround(
      col("_gf_n").cast(DoubleType) * num * num / den, 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_gf_g").orderBy(col("_chi").desc, col("term"))
    cells.withColumn("_chi", chi2)
      .where(col("_chi").isNotNull)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("_gf_g").as(groupCol), col("term"), col("df_in"),
        col("df_out"), col("_chi").as("chi2"), col("rank").cast("int").as("rank"))
  }
}
