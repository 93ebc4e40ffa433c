package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    def mat(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(): Unit
    }
    val par = Tables.embeddings(spark, dir)          // repartition(32)
    val single = spark.read.parquet(dir + "/embeddings.parquet") // 1 split
    for (i <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      time(s"[$i] semdedup par32") {
        mat(graft.sim.SemDedup.dedup(par, "vec_id", "embedding", k = 8,
          threshold = 0.95, iters = 2)) }
      spark.sharedState.cacheManager.clearCache()
      time(s"[$i] semdedup single") {
        mat(graft.sim.SemDedup.dedup(single, "vec_id", "embedding", k = 8,
          threshold = 0.95, iters = 2)) }
      spark.sharedState.cacheManager.clearCache()
      time(s"[$i] semdedup par8") {
        mat(graft.sim.SemDedup.dedup(single.repartition(8), "vec_id",
          "embedding", k = 8, threshold = 0.95, iters = 2)) }
    }
    spark.stop()
  }
}
