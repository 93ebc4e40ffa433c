package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-budget document chunking with overlap — the standard
  * context-window prep step of an LLM training/RAG pipeline: split each
  * document into windows of at most `maxTokens` whitespace tokens, each
  * window starting `maxTokens − overlap` tokens after the previous one, so
  * consecutive chunks share `overlap` tokens of context and no token is
  * more than one window away from its neighbours. The dual of sequence
  * PACKING (SURVEY row 67, [[graft.ops.Packing]]): packing concatenates
  * short documents up to the budget, chunking splits long ones down to it.
  *
  * Chunk-count contract (deterministic, engine-mirrorable):
  * `nchunks = 1 + ceil(max(0, ntok − maxTokens) / stride)` — one chunk for
  * anything that fits, and exactly enough further strides to cover the
  * tail; the last chunk may be shorter than `maxTokens` but is never an
  * empty suffix, and no chunk is fully contained in the previous one.
  *
  * Spark shape: trim → split → `sequence`/`explode` → `slice` +
  * `array_join` — per-row builtin expressions only, a pure projection
  * inside WholeStageCodegen. No shuffle at ANY corpus size; output rows ≈
  * Σ ntok/stride, each carrying one chunk's text (never the full token
  * array past the explode). Tokenization is the raw `\s+` split (case
  * PRESERVED — chunks feed a downstream tokenizer, unlike the lowercased
  * analysis tokens of [[TextAnalysis.tokens]]). */
object Chunking {

  /** (idCol, chunk_id, chunk_text, n_tokens) — one row per chunk.
    * Blank/empty documents produce zero rows (nothing to train on).
    * `overlap` must leave a positive stride. `carry` columns (document
    * metadata like source/lang) are projected onto every chunk of their
    * document — still a per-row projection, no join. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            maxTokens: Int, overlap: Int = 0,
            carry: Seq[String] = Nil): DataFrame = {
    require(maxTokens >= 1, s"maxTokens=$maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap=$overlap must be in [0, maxTokens=$maxTokens)")
    val stride = maxTokens - overlap
    val toks: Column = split(trim(col(textCol)), "\\s+")
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol) +: carry.map(col) :+ toks.as("_gf_toks"): _*)
      .withColumn("_gf_ntok", size(col("_gf_toks")))
      .withColumn("_gf_nchunks",
        (lit(1) + floor((greatest(col("_gf_ntok") - maxTokens, lit(0))
          + lit(stride - 1)) / lit(stride))).cast("int"))
      .withColumn("chunk_id",
        explode(sequence(lit(0), col("_gf_nchunks") - 1)))
      .withColumn("n_tokens",
        least(col("chunk_id") * stride + maxTokens, col("_gf_ntok"))
          - col("chunk_id") * stride)
      .select(col(idCol) +: col("chunk_id") +:
        array_join(slice(col("_gf_toks"),
          col("chunk_id") * stride + 1, col("n_tokens")), " ")
          .as("chunk_text") +:
        col("n_tokens") +: carry.map(col): _*)
  }

  /** DuckDB mirror of [[chunk]] over a table/view — same tokenization
    * (`\s+` on the trimmed text; the Java∩RE2 parity the text family
    * already relies on), same chunk-count formula, same slicing. */
  def sqlChunk(table: String, idCol: String, textCol: String,
               maxTokens: Int, overlap: Int = 0): String = {
    val stride = maxTokens - overlap
    s"""
      WITH _t AS (
        SELECT $idCol, regexp_split_to_array(trim($textCol), '\\s+') AS toks,
               len(regexp_split_to_array(trim($textCol), '\\s+')) AS ntok
        FROM $table WHERE length(trim($textCol)) > 0
      ), _n AS (
        SELECT $idCol, toks, ntok,
               1 + CAST(floor((greatest(ntok - $maxTokens, 0) + ${stride - 1})
                              / $stride.0) AS BIGINT) AS nchunks
        FROM _t
      ), _e AS (
        SELECT $idCol, toks, ntok, unnest(range(nchunks)) AS chunk_id FROM _n
      )
      SELECT $idCol, CAST(chunk_id AS INT) AS chunk_id,
             array_to_string(toks[chunk_id * $stride + 1 :
               least(chunk_id * $stride + $maxTokens, ntok)], ' ') AS chunk_text,
             CAST(least(chunk_id * $stride + $maxTokens, ntok)
               - chunk_id * $stride AS INT) AS n_tokens
      FROM _e"""
  }
}
