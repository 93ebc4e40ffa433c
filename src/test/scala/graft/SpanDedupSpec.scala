package graft

import graft.text.CorpusOps
import org.apache.spark.sql.functions._

/** Pins cross-document repeated-span removal
  * ([[graft.text.CorpusOps.dedupeSpans]]): keep-first semantics, span
  * union across overlapping grams, case handling, and the
  * novel-text-survives property. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, r: Range): String =
    r.map(i => s"$prefix$i").mkString(" ")

  test("a copied passage vanishes from the later doc in one piece") {
    val passage = toks("p", 1 to 20)
    val docA = s"${toks("a", 1 to 5)} $passage ${toks("a", 6 to 10)}"
    val docB = s"${toks("b", 1 to 7)} $passage ${toks("b", 8 to 12)}"
    val out = CorpusOps.dedupeSpans(
        Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"),
        "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    // doc 1 (first occurrence) intact
    assert(out(0).getString(1) == docA)
    assert(out(0).getInt(2) == 0)
    // doc 2 loses exactly the 20 copied tokens, surroundings survive
    assert(out(1).getString(1) == s"${toks("b", 1 to 7)} ${toks("b", 8 to 12)}")
    assert(out(1).getInt(2) == 20)
  }

  test("within-document repetition drops the second occurrence only") {
    val phrase = toks("x", 1 to 10)
    val doc = s"$phrase ${toks("m", 1 to 4)} $phrase"
    val out = CorpusOps.dedupeSpans(
        Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", n = 8)
      .collect()(0)
    assert(out.getString(1) == s"$phrase ${toks("m", 1 to 4)}")
    assert(out.getInt(2) == 10)
  }

  test("detection is case-insensitive; kept text preserves case") {
    val passage = toks("Q", 1 to 12)
    val docA = s"alpha beta $passage gamma delta"
    val docB = s"ONE two ${passage.toLowerCase} THREE four"
    val out = CorpusOps.dedupeSpans(
        Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"),
        "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == docA) // original case kept
    assert(out(1).getString(1) == "ONE two THREE four")
  }

  test("keep-first is by (id, position): the smallest doc id wins") {
    val passage = toks("z", 1 to 9)
    val rows = Seq((30L, s"$passage ${toks("c", 1 to 3)}"),
                   (10L, s"${toks("d", 1 to 3)} $passage"),
                   (20L, passage))
    val out = CorpusOps.dedupeSpans(rows.toDF("doc_id", "text"),
        "doc_id", "text", n = 9)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(0) == 10L && out(0).getInt(2) == 0) // keeper
    assert(out(1).getString(1) == "")                          // fully copied
    assert(out(2).getString(1) == toks("c", 1 to 3))
  }

  test("plan pin: keep-first is a partial-aggregating min, not a rank window") {
    val df = Seq((1L, toks("w", 1 to 30))).toDF("doc_id", "text")
    val plan = CorpusOps.dedupeSpans(df, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    // the skew-robustness claim: no sort window over the gram hash — the
    // boilerplate gram occurring 10^9 times must collapse map-side
    assert(!plan.contains("Window"), s"rank window crept in:\n$plan")
    val aggs = "(HashAggregate|ObjectHashAggregate|SortAggregate)".r
      .findAllIn(plan).size
    assert(aggs >= 2, s"expected a partial+final aggregate pair, got $aggs")
  }

  test("a ~50k-token fully-duplicated doc cuts in linear time") {
    // The adversarial input shape: a boilerplate-heavy page where spans ~=
    // tokens. The old per-token exists() over the unmerged span list was
    // O(L^2) here (~2.5e9 struct comparisons at L=50k); the relational cut
    // (explode deleted indexes -> distinct -> anti-join) is O(L*n).
    val l = 50000
    val big = toks("t", 1 to l)
    val out = CorpusOps.dedupeSpans(
        Seq((1L, big), (2L, big), (3L, toks("u", 1 to 5))).toDF("doc_id", "text"),
        "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == big && out(0).getInt(2) == 0)  // keeper intact
    assert(out(1).getString(1) == "" && out(1).getInt(2) == l)   // copy vanishes
    assert(out(2).getString(1) == toks("u", 1 to 5))             // novel survives
  }

  test("documents shorter than n and blank documents pass through") {
    val rows = Seq((1L, "just a few tokens"), (2L, "   "), (3L, ""))
    val out = CorpusOps.dedupeSpans(rows.toDF("doc_id", "text"),
        "doc_id", "text", n = 16)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "just a few tokens")
    assert(out(1).getString(1) == "" && out(2).getString(1) == "")
    assert(out.forall(_.getInt(2) == 0))
  }
}
