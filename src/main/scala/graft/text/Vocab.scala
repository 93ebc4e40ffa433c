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
}
