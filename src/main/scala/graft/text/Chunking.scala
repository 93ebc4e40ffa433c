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

  /** Tokenizer-aware chunking: split each document into chunks whose
    * token BUDGET is accounted in `wordCost` units per word (e.g. BPE
    * subwords via [[chunkBpe]]) instead of 1-per-whitespace-word. A
    * packing plan computed on whitespace counts misallocates the budget
    * the trainer actually sees (prose under-counts ~1.3×, code/CJK far
    * worse) — this lane closes the curation → tokenize → pack seam.
    *
    * Chunk rule: the [[graft.ops.Packing]] BIN rule, word-atomic — a
    * word belongs to the chunk its cumulative cost OFFSET falls in
    * (`floor(start / budget)`), bucket ids densified in order. So chunk
    * boundaries land every `budget` cost units; a word straddling a
    * boundary stays whole in its starting chunk (a chunk can exceed the
    * budget by at most that word's cost − 1 — words are atomic, exactly
    * packing's bin semantics, and the contract a cumsum window mirrors
    * in SQL). With `wordCost = 1` this degenerates to [[chunk]] with
    * `overlap = 0` (pinned in ChunkingSpec).
    *
    * Spark shape: pure per-row higher-order functions (costs →
    * running-sum fold → bucket → per-chunk filter) — no shuffle at ANY
    * corpus size, same as [[chunk]]. Per-doc cost is O(words × chunks)
    * like [[chunk]]'s slicing.
    *
    * Output: (idCol, chunk_id, chunk_text, n_words, n_tokens) where
    * n_tokens is the chunk's cost total in tokenizer units. */
  def chunkByCost(df: DataFrame, idCol: String, textCol: String,
                  wordCost: Column => Column, budget: Int,
                  carry: Seq[String] = Nil): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    val ws = filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0)
    val out = df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol) +: carry.map(col) :+ ws.as("_gf_ws"): _*)
      .withColumn("_gf_costs",
        transform(col("_gf_ws"), w => wordCost(w).cast("long")))
      // Running cost sum as a fold (array grows left-to-right; the
      // element_at(-1) only evaluates on the non-empty branch).
      .withColumn("_gf_cums",
        aggregate(col("_gf_costs"), typedLit(Array.empty[Long]),
          (acc, x) => concat(acc, array(
            when(size(acc) === 0, x).otherwise(element_at(acc, -1) + x)))))
      .withColumn("_gf_bks",
        zip_with(col("_gf_cums"), col("_gf_costs"),
          (c, x) => floor((c - x) / lit(budget.toDouble)).cast("long")))
      // Monotone buckets → array_distinct is the ordered dense index.
      .withColumn("_gf_db", array_distinct(col("_gf_bks")))
      .withColumn("chunk_id",
        explode(sequence(lit(0), size(col("_gf_db")) - 1)))
      .withColumn("_gf_bv", element_at(col("_gf_db"), col("chunk_id") + 1))
    out.select(
      col(idCol) +: col("chunk_id") +:
        array_join(
          filter(col("_gf_ws"),
            (w, i) => element_at(col("_gf_bks"), i + 1) === col("_gf_bv")),
          " ").as("chunk_text") +:
        size(filter(col("_gf_bks"), b => b === col("_gf_bv"))).as("n_words") +:
        aggregate(
          zip_with(col("_gf_costs"), col("_gf_bks"),
            (c, b) => when(b === col("_gf_bv"), c).otherwise(lit(0L))),
          lit(0L), (acc, x) => acc + x).as("n_tokens") +:
        carry.map(col): _*)
  }

  /** [[chunkByCost]] under a trained BPE model: per-word cost = subword
    * count from the codegen'd [[graft.functions.BpeEncode]] (merge table
    * rides the serialized plan — numMerges-bounded). */
  def chunkBpe(df: DataFrame, idCol: String, textCol: String,
               model: Bpe.Model, budget: Int,
               carry: Seq[String] = Nil): DataFrame =
    chunkByCost(df, idCol, textCol,
      w => size(graft.functions.BpeEncodeFun.bpeEncode(w, model.merges)),
      budget, carry)

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
