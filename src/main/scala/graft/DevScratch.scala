package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

// Dev-only scratch main for perf A/B experiments; not part of the contract.
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Tables.documents(spark, "/root/testdata/sf0.1").cache()
    df.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      System.err.println(f"AB $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val c = col("text")
    val toks = TextAnalysis.tokens(c)
    for (_ <- 1 to 2) {
      time("full_quality") { df.select(TextAnalysis.qualityScore(c)).queryExecution.toRdd.count() }
      time("ntok_only") { df.select(size(toks)).queryExecution.toRdd.count() }
      time("punct_only") { df.select(regexp_count(c, lit("[^A-Za-z0-9\\s]"))).queryExecution.toRdd.count() }
      time("stophits_only") { df.select(TextAnalysis.stopwordHits(toks, TextAnalysis.stopwords.toMap.apply("en"))).queryExecution.toRdd.count() }
      time("distinct_only") { df.select(size(array_distinct(toks))).queryExecution.toRdd.count() }
      time("langid") { df.select(TextAnalysis.languageId(c)).queryExecution.toRdd.count() }
    }
    spark.stop()
  }
}
