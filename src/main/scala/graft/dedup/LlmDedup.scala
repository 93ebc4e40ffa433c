package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale deduplication for training-data pipelines (SURVEY §2.3).
  * Exact dedup here; MinHash/SimHash/Jaccard/embedding near-dup live in
  * their own files.
  */
object LlmDedup {

  /** Exact dedup by normalized-content fingerprint: canonicalize (lower,
    * strip punctuation, collapse whitespace), hash (xxhash64 — a cheap
    * 8-byte shuffle key instead of the full document), keep the smallest
    * `idCol` per fingerprint group. ONE hash shuffle on the fingerprint;
    * the document body itself never needs to be the key. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("_gf_fp")).orderBy(col(idCol))
    df.withColumn("_gf_fp", TextAnalysis.fingerprint64(col(textCol)))
      .withColumn("_gf_rn", row_number().over(w))
      .filter(col("_gf_rn") === 1)
      .drop("_gf_fp", "_gf_rn")
  }

  /** Incremental exact dedup: the production shape where a corpus snapshot
    * already exists and only a NEW BATCH arrives. The batch is deduped
    * within itself ([[exact]]), then anti-joined against the index's
    * fingerprint set — so the index side contributes only 8-byte hashes to
    * the join (at 100 TB you persist those fingerprints once and append
    * the survivors' hashes per batch, never re-reading index text). */
  def incremental(batch: DataFrame, index: DataFrame,
                  textCol: String, idCol: String): DataFrame = {
    val indexFp = index
      .select(TextAnalysis.fingerprint64(col(textCol)).as("_gf_fp")).distinct()
    // Inline [[exact]]'s window so the batch fingerprint (two regex
    // rewrites + hash over the document body) is computed ONCE and reused
    // by the anti-join, instead of dropped and recomputed per row.
    val w = Window.partitionBy(col("_gf_fp")).orderBy(col(idCol))
    batch.withColumn("_gf_fp", TextAnalysis.fingerprint64(col(textCol)))
      .withColumn("_gf_rn", row_number().over(w))
      .filter(col("_gf_rn") === 1)
      .drop("_gf_rn")
      .join(indexFp, Seq("_gf_fp"), "left_anti")
      .drop("_gf_fp")
  }

  /** Groups of exact duplicates (fingerprint, ids, count) — the audit
    * artifact of [[exact]]. */
  def exactClusters(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.withColumn("_gf_fp", TextAnalysis.fingerprint64(col(textCol)))
      .groupBy(col("_gf_fp").as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(col(idCol))).as("doc_ids"))
      .filter(col("n_docs") > 1)
}
