package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Dev-only scratch main for perf A/B experiments; not part of the contract.
object DevScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"AB $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    for (i <- 1 to 3) {
      val corpus = graft.queries.NearDupQueries.truncatedCorpus(spark, dir)
      val pairs = graft.dedup.MinHash.nearDuplicatePairs(corpus, "text", "doc_id",
        n = 5, k = 64, bands = 16, threshold = 0.5)
      val p0 = time(s"[$i] pairs materialize") {
        val t = pairs.localCheckpoint(true); t.count(); t
      }
      val (labels, rounds) = time(s"[$i] CC on materialized") {
        val lr = graft.dedup.Components.componentLabelsWithRounds(p0)
        lr._1.queryExecution.toRdd.count()
        lr
      }
      System.err.println(s"AB [$i] rounds=$rounds")
    }
    spark.stop()
  }
}
