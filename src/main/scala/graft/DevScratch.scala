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
    def mat(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(): Unit
    }

    // Stage-by-stage cost of the curation-chain prefix (llm_curation_sql_prefix)
    for (i <- 1 to 3) {
      spark.sharedState.cacheManager.clearCache()
      val docs = Tables.documents(spark, dir).select("doc_id", "source", "text")
      val corpus = docs.withColumn("text", graft.text.CorpusOps.redact(col("text")))
      val gated = corpus
        .filter(graft.text.TextAnalysis.qualityScore(col("text")) >= 0.3 &&
          graft.text.TextAnalysis.languageId(col("text")) === "en")
      val gophed = graft.text.GopherRules.filterDocs(gated, "text",
        graft.text.GopherRules.Config(minWords = 10, minStopHits = 1))
      time(s"[$i] gophed") { mat(gophed) }
      val lm = time(s"[$i] lm.train") {
        graft.text.LangModel.train(docs.filter(col("doc_id") % 3 === 0), "text")
      }
      val lmKeep = graft.text.LangModel.score(
          gophed.select("doc_id", "text"), "doc_id", "text", lm, hashKeys = true)
        .filter(col("avg_logprob") >= -3.52)
        .select("doc_id")
      val lmKept = gophed.join(lmKeep, Seq("doc_id"), "left_semi")
      time(s"[$i] lmKept") { mat(lmKept) }
      val exact = graft.dedup.LlmDedup.exact(lmKept, "text", "doc_id")
      time(s"[$i] exact") { mat(exact) }
      val capped = graft.ops.Quota.capPerGroup(exact, "source", "doc_id", n = 20)
      time(s"[$i] capped") { mat(capped) }
      val sampled = graft.ops.Sampling.weightedSample(capped, "doc_id",
        least(lit(1.0),
          graft.text.TextAnalysis.tokenCount(col("text"))
            .cast(org.apache.spark.sql.types.DoubleType) / lit(60.0)))
        .select("doc_id").orderBy("doc_id")
      time(s"[$i] full prefix") { mat(sampled) }
      lm.release()
    }
    spark.stop()
  }
}
