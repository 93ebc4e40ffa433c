package graft

import org.apache.spark.sql.functions._

import graft.text.Winnow

/** Pins for winnowing fingerprints (SURVEY §2 row 152): the paper's
  * detection guarantee on a planted shared passage, hand-traced window
  * selection, the rightmost-on-ties rule via the arithmetic code,
  * short-doc partial-window behavior, df-cap pruning in the pair
  * builder, and the refusal ladder. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  test("guarantee: any shared passage of >= k+w-1 tokens shares a fingerprint") {
    // k=3, w=3 → guarantee threshold 5 tokens. Plant a 9-token passage
    // inside two otherwise-disjoint documents.
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota"
    val docs = Seq(
      (1L, s"one two three $passage four five six"),
      (2L, s"seven eight nine ten $passage eleven"),
      (3L, "unrelated words only here nothing shared at all")).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 3, w = 3)
    val h1 = fps.filter(col("doc_id") === 1).select("fp_hash").as[Long].collect().toSet
    val h2 = fps.filter(col("doc_id") === 2).select("fp_hash").as[Long].collect().toSet
    val h3 = fps.filter(col("doc_id") === 3).select("fp_hash").as[Long].collect().toSet
    assert((h1 intersect h2).nonEmpty, "planted passage must share a fingerprint")
    assert((h1 intersect h3).isEmpty && (h2 intersect h3).isEmpty)
  }

  test("hand-traced selection: min hash wins, rightmost on ties") {
    // One doc, k=2 → grams "a b"(0) "b a"(1) "a b"(2) "b a"(3); w=4 →
    // one full window over all four. The duplicated gram has EQUAL
    // hashes at two positions; the tie rule must pick the RIGHTMOST.
    val docs = Seq((1L, "a b a b a")).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 2, w = 4)
      .select("fp_pos", "fp_hash").as[(Long, Long)].collect().toSeq
    assert(fps.size == 1)
    // Hand trace with the same md5-prefix hash and arithmetic code.
    val coded = Seq(("a b", 0L), ("b a", 1L), ("a b", 2L), ("b a", 3L))
      .map { case (g, p) =>
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(g.getBytes("UTF-8"))
            .take(4).map(b => f"$b%02x").mkString, 16)
        (h * Winnow.PosBase + (Winnow.PosMask - p), h, p)
      }
    val sel = coded.minBy(_._1)
    assert(fps.head == ((sel._3, sel._2)),
      "engine selection must equal the arithmetic-code hand trace")
    val minH = coded.map(_._2).min
    val rightmost = coded.filter(_._2 == minH).map(_._3).max
    assert(sel._3 == rightmost, "tie must decode to the rightmost position")
  }

  test("short docs fingerprint via the partial pos-0 window; sub-k docs emit nothing") {
    val docs = Seq((1L, "just three words"), (2L, "tiny")).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 3, w = 5)
    // doc 1: one gram, fewer than w → the pos-0 partial window selects it.
    assert(fps.filter(col("doc_id") === 1).count() == 1)
    assert(fps.filter(col("doc_id") === 2).count() == 0)
  }

  test("overlapPairs: planted clones pair; df-capped boilerplate does not") {
    val boiler = "common header words repeated in every single document body"
    val docs = (1L to 6L).map(i => (i, s"$boiler unique$i filler$i words$i end$i tail$i"))
      .toDF("doc_id", "text")
      .unionByName(Seq(
        (10L, "a distinct cloned passage appears verbatim right here today"),
        (11L, "a distinct cloned passage appears verbatim right here today"))
        .toDF("doc_id", "text"))
    val pairs = Winnow.overlapPairs(docs, "doc_id", "text",
      k = 3, w = 3, minShared = 2, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)), "clones must pair")
    // boilerplate fingerprints hit 6 docs > maxDf=3 → pruned; the six
    // boiler docs share nothing else, so no pair among ids 1..6
    assert(!pairs.exists { case (a, b) => a <= 6 && b <= 6 })
  }

  test("refusals") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](Winnow.fingerprints(docs, "doc_id", "text", k = 1))
    intercept[IllegalArgumentException](Winnow.fingerprints(docs, "doc_id", "text", w = 1))
    intercept[IllegalArgumentException](
      Winnow.overlapPairs(docs, "doc_id", "text", minShared = 0))
    intercept[IllegalArgumentException](
      Winnow.overlapPairs(docs, "doc_id", "text", maxDf = 1))
  }
}
