package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing: assign documents to fixed-token-budget bins (the
  * batches an LLM trainer feeds), streaming-packer style — documents are
  * taken in a deterministic order and a document belongs to the bin its
  * cumulative start offset falls in (`floor(start / budget)`).
  *
  * Packing runs independently per shard (`shardCol`): each shard's
  * cumulative sum is its own window partition, so the shuffle key is the
  * shard and no global ordering exists — the 100 TB shape (a GLOBAL
  * cumsum would serialize the corpus through one partition; with shards
  * it's one sort-based window per shard, spill-safe). Bin ids are
  * per-shard.
  *
  * Returns per-bin stats: (shard, bin, n_docs, n_tokens, fill_frac) —
  * join the doc→bin assignment back by re-running the same window when the
  * assignment itself is the artifact to persist.
  */
object Packing {

  def packStats(df: DataFrame, shardCol: String, idCol: String,
                tokCol: String, budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val toks = col(tokCol).cast(LongType)
    // Tie-break duplicate ids by token count: with orderBy(id) alone the
    // cumsum — and so the bin split — would depend on partition scan
    // order. Rows identical in (id, tok) are interchangeable, so this
    // suffices for a deterministic result.
    val w = Window.partitionBy(shardCol).orderBy(col(idCol), toks)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_gf_cum", sum(toks).over(w))
      .withColumn("bin", ((col("_gf_cum") - toks) / lit(budget)).cast(LongType))
      .groupBy(col(shardCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(toks).as("n_tokens"),
        graft.Num.dround(sum(toks).cast("double") / lit(budget.toDouble), 4)
          .as("fill_frac"))
  }

  /** Tokenizer-consistent packing: bin documents by the token count the
    * TRAINER will actually see — per-doc subword counts from the
    * codegen'd [[graft.functions.BpeEncode]] under a trained/persisted
    * BPE model — instead of a caller-supplied whitespace count column. A
    * whitespace-budget plan under-counts prose ~1.3× (code/CJK far
    * worse), so its bins overflow the trainer's context window. Same
    * per-shard window shape as [[packStats]]; the encode is one more
    * codegen'd projection on the scan, no extra shuffle. */
  def packStatsBpe(df: org.apache.spark.sql.DataFrame, shardCol: String,
                   idCol: String, textCol: String,
                   model: graft.text.Bpe.Model, budget: Long): org.apache.spark.sql.DataFrame =
    packStats(
      df.withColumn("_gf_bpe_tok",
        size(graft.functions.BpeEncodeFun.bpeEncode(col(textCol), model.merges))),
      shardCol, idCol, "_gf_bpe_tok", budget)
}
