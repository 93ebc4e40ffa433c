package graft

import graft.text.Bm25
import org.apache.spark.sql.functions._

/** Pins for BM25 retrieval ([[graft.text.Bm25]]): a hand-computed score
  * on a 3-doc corpus, rank-1 self-find, and parameter refusals. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat sat mat"),         // len 3
    (2L, "cat cat dog"),         // len 3
    (3L, "bird bird bird bird")) // len 4 -> avgdl = 10/3
    .toDF("doc_id", "text")

  test("hand-computed score on a 3-doc corpus") {
    // query "cat": df=2, N=3, idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6)
    // doc 2: tf=2, len=3 -> s = idf*2*2.2 / (2 + 1.2*(0.25 + 0.75*3/(10/3)))
    val out = Bm25.topK(corpus, "doc_id", "text",
        Seq((100L, "cat")).toDF("qid", "text"), "qid", "text", k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 1L)) // tf=2 beats tf=1
    val idf = math.log(1.6)
    def s(tf: Double, len: Double): Double = {
      val raw = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len / (10.0 / 3.0)))
      // the per-term 6dp rounding, then the exact-decimal 4dp emit
      val r6 = math.floor(raw * 1e6 + 0.5) / 1e6
      math.floor(r6 * 1e4 + 0.5) / 1e4
    }
    assert(out(0).getDouble(3) == s(2, 3), s"got ${out(0).getDouble(3)}")
    assert(out(1).getDouble(3) == s(1, 3))
    // doc 3 shares no term: absent entirely, not zero-scored
    assert(!out.map(_.getLong(2)).contains(3L))
  }

  test("distinctive-vocabulary queries find their document at rank 1") {
    // each doc carries unique rare terms plus shared filler: the rare
    // terms' idf dominates, so querying with a doc's text must return
    // that doc first. (NOT true of a homogeneous corpus — BM25 favors
    // term frequency over identity, by design.)
    val docs = (0 until 20).map(i =>
      (i.toLong, s"uniq${i}a uniq${i}b uniq${i}c the and of"))
      .toDF("doc_id", "text")
    val out = Bm25.topK(docs, "doc_id", "text",
        docs.filter(col("doc_id") < 5).select(col("doc_id").as("qid"), col("text")),
        "qid", "text", k = 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    assert(out.length == 5 && out.forall { case (q, d) => q == d },
      s"self-find failed: ${out.mkString(", ")}")
  }

  test("plan: term pruning under the postings agg; df and queries broadcast") {
    val q = Seq((100L, "cat dog")).toDF("qid", "text")
    val p = Bm25.topK(corpus, "doc_id", "text", q, "qid", "text", k = 5)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // every join is broadcast — the corpus side never sort-merges
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // the query-term semi-join sits below the postings aggregation
    // (keys term/did/len), so the token stream is pruned before the
    // first corpus-sized exchange. SimpleMode prints parents before
    // children, so the semi-join must print AFTER that aggregate.
    val semiIdx = p.indexOf("LeftSemi")
    val postingsAggIdx = p.indexOf("keys=[_gf_term")
    assert(semiIdx >= 0 && postingsAggIdx >= 0, p)
    assert(semiIdx > postingsAggIdx, p)
  }

  test("parameter refusals") {
    val q = Seq((1L, "x")).toDF("qid", "text")
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "doc_id", "text", q, "qid", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "doc_id", "text", q, "qid", "text", b = 1.5)
    }
  }
}
