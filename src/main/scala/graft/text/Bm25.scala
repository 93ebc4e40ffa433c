package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** BM25 lexical retrieval (Robertson & Zaragoza, "The Probabilistic
  * Relevance Framework: BM25 and Beyond", FnTIR 2009) — keyword top-k
  * over the corpus: the lexical complement to the embedding ANN family
  * (the standard hybrid-retrieval pair in a RAG/dedup pipeline), and the
  * relevance-weighted upgrade of `text_tfidf`'s raw tf·idf.
  *
  *   score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf · (k1+1) /
  *                                (tf + k1 · (1 − b + b · len_d / avgdl))
  *   idf(t) = ln(1 + (N − df + 0.5) / (df + 0.5))     (Lucene's form:
  *            strictly positive, no disappearing common terms)
  *
  * Everything is the relational inverted-index shape: the postings table
  * (term, doc, tf) IS the index, queries join it on the term — one
  * equi-join whose probe side is the query batch's distinct terms, so a
  * dimension-sized query batch broadcasts and the corpus-sized token
  * stream never moves: a broadcast semi-join on the query's term set
  * sits UNDER the postings aggregation, so the one corpus-sized exchange
  * carries only query-term rows, and the query-term-sized df table
  * broadcasts into the score join instead of riding an exchange of the
  * whole vocabulary. Document length and avgdl are one aggregate each
  * (avgdl a broadcast 1-row frame). Per-(query, doc, term) scores round to 6dp and
  * accumulate as exact decimals — the engine's cross-engine float-parity
  * rule — then one per-query window ranks the top k.
  *
  * Duplicate query terms score ONCE (the standard bag-of-words-of-the-
  * DOCUMENT formulation: query-side tf is nearly always 1 in web queries;
  * `distinct` makes that explicit and keeps the oracle trivial). */
object Bm25 {

  /** Top-k corpus documents per query row. `queries` is a dimension-sized
    * batch (broadcast — the [[graft.sim.Ivf.topK]] contract); self-matches
    * are kept (a query that IS a corpus doc finds itself — callers doing
    * near-dup triage filter `query_id =!= doc_id`). Output: (query_id,
    * rank, doc_id, score). */
  def topK(corpus: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, queryId: String, queryText: String,
           k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(k1 >= 0 && b >= 0 && b <= 1, s"k1=$k1 must be >= 0, b=$b in [0,1]")
    val toks = TextAnalysis.tokens(col(textCol))
    val base = corpus
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol).as("_gf_did"), toks.as("_gf_t"))
      .withColumn("_gf_len", size(col("_gf_t")))
    val qTerms = queries
      .filter(length(trim(col(queryText))) > 0)
      .select(col(queryId).as("_gf_qid"),
        explode(TextAnalysis.tokens(col(queryText))).as("_gf_term"))
      .filter(length(col("_gf_term")) > 0)
      .distinct()
    // postings: (term, doc, tf, len) — the inverted index, pruned to the
    // query batch's terms BEFORE the aggregation: the broadcast semi-join
    // sits under the groupBy, so the one corpus-sized exchange carries
    // only query-term token rows, never the whole token stream. tf and
    // df are unchanged by the pruning (the semi-join keeps EVERY
    // occurrence of a kept term).
    val postings = base
      .select(col("_gf_did"), col("_gf_len"),
        explode(col("_gf_t")).as("_gf_term"))
      .filter(length(col("_gf_term")) > 0)
      .join(broadcast(qTerms.select("_gf_term").distinct()),
        Seq("_gf_term"), "left_semi")
      .groupBy("_gf_term", "_gf_did", "_gf_len")
      .agg(count(lit(1)).as("_gf_tf"))
    // df over the pruned postings is still the FULL-corpus document
    // frequency of each query term; the result is query-term-sized, so
    // it broadcasts into the score join instead of riding an exchange
    val dfTerm = postings.groupBy("_gf_term")
      .agg(count(lit(1)).as("_gf_df"))
    // N and avgdl: one 1-row aggregate, broadcast into the score. avgdl
    // is an exact LONG sum divided once — avg(double) would be
    // partition-order-dependent and break cross-engine parity
    val stats = base.agg(
      count(lit(1)).as("_gf_n"),
      (sum(col("_gf_len")).cast(DoubleType)
        / count(lit(1)).cast(DoubleType)).as("_gf_avgdl"))
    val perTerm = postings
      .join(broadcast(qTerms), Seq("_gf_term"))
      .join(broadcast(dfTerm), Seq("_gf_term"))
      .crossJoin(broadcast(stats))
      .withColumn("_gf_idf",
        log(lit(1.0) + (col("_gf_n").cast(DoubleType) - col("_gf_df") + 0.5)
          / (col("_gf_df").cast(DoubleType) + 0.5)))
      .withColumn("_gf_s", graft.Num.dround(
        col("_gf_idf") * col("_gf_tf").cast(DoubleType) * lit(k1 + 1.0)
          / (col("_gf_tf").cast(DoubleType)
            + lit(k1) * (lit(1.0 - b)
              + lit(b) * col("_gf_len").cast(DoubleType) / col("_gf_avgdl"))),
        6))
    val w = Window.partitionBy("_gf_qid")
      .orderBy(col("score").desc, col("_gf_did"))
    perTerm
      .groupBy("_gf_qid", "_gf_did")
      // round the EXACT decimal total to 4dp before the double cast (the
      // Q.dsum rule: a low-digit decimal converts to double identically
      // everywhere; a wide numerator may lose different ulps per engine)
      .agg(round(sum(col("_gf_s").cast(DecimalType(38, 6))), 4)
        .cast(DoubleType).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("_gf_qid").as("query_id"), col("rank"),
        col("_gf_did").as("doc_id"), col("score"))
  }
}
