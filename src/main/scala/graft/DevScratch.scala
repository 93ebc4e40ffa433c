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
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      System.err.println(f"AB $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    for (_ <- 1 to 3)
      time("topNgrams") {
        TextAnalysis.topNgrams(docs, "text", 2, 20).queryExecution.toRdd.count()
      }
    spark.stop()
  }
}
