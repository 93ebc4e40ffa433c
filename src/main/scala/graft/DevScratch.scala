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
      System.err.println(f"AB $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    def relationalSignatures(df: org.apache.spark.sql.DataFrame,
                             textCol: String, idCol: String,
                             n: Int, k: Int) = {
      val hashed = df
        .select(col(idCol).as("_gf_id"),
          explode(graft.dedup.MinHash.shingles(col(textCol), n)).as("_gf_s"))
        .select(col("_gf_id"), xxhash64(col("_gf_s")).as("_gf_hh"))
      hashed.groupBy("_gf_id")
        .agg(min(xxhash64(col("_gf_hh"), lit(0))).as("_gf_m0"),
          (1 until k).map(i => min(xxhash64(col("_gf_hh"), lit(i))).as(s"_gf_m$i")): _*)
        .select(col("_gf_id"),
          array((0 until k).map(i => col(s"_gf_m$i")): _*).as("_gf_sig"))
    }

    val corpus = graft.queries.NearDupQueries.truncatedCorpus(spark, dir)
    for (i <- 1 to 3) {
      time(s"[$i] kernel sigs") {
        graft.dedup.MinHash.signatures(corpus, "text", "doc_id", 5, 64)
          .queryExecution.toRdd.count()
      }
      time(s"[$i] relational sigs") {
        relationalSignatures(corpus, "text", "doc_id", 5, 64)
          .queryExecution.toRdd.count()
      }
      time(s"[$i] shingles only") {
        corpus.select(graft.dedup.MinHash.shingles(col("text"), 5).as("s"))
          .queryExecution.toRdd.count()
      }
      time(s"[$i] kernel no-repart") {
        corpus.select(col("doc_id"),
            graft.functions.GraftFunctions.minhashSig(
              graft.dedup.MinHash.shingles(col("text"), 5), 64).as("_gf_sig"))
          .filter(col("_gf_sig").isNotNull)
          .queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
