package graft

import graft.text.GopherRules
import org.apache.spark.sql.functions._

/** Pins for the Gopher quality rules ([[graft.text.GopherRules]]):
  * hand-computed signals per rule, inclusive boundary discipline, blank
  * documents, the zero-shuffle filter form, and config refusals. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def auditOne(text: String, cfg: GopherRules.Config = GopherRules.Config()) =
    GopherRules.audit(Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", cfg)
      .collect().head

  test("hand-computed signals on a crafted two-line document") {
    val text = "- alpha beta gamma\nthe cat sat on 42..."
    // tokens: -, alpha, beta, gamma, the, cat, sat, on, 42... (9)
    val r = auditOne(text)
    assert(r.getAs[Int]("n_words") == 9)
    // length sum: 1+5+4+5+3+3+3+2+5 = 31 -> mean 31/9
    assert(r.getAs[Double]("mean_word_len") == math.floor(31.0 / 9 * 1e6 + 0.5) / 1e6)
    // symbols: one non-overlapping "..." (no '#', no U+2026) -> 1/9
    assert(r.getAs[Double]("symbol_ratio") == math.floor(1.0 / 9 * 1e6 + 0.5) / 1e6)
    // 2 lines, 1 bullet-led, 1 ellipsis-ended
    assert(r.getAs[Double]("bullet_frac") == 0.5)
    assert(r.getAs[Double]("ellipsis_frac") == 0.5)
    // alpha words: all but "-" and "42..." -> 7/9
    assert(r.getAs[Double]("alpha_frac") == math.floor(7.0 / 9 * 1e6 + 0.5) / 1e6)
    // distinct stopword presence: "the" only
    assert(r.getAs[Int]("stop_hits") == 1)
    // defaults: fails words(9<50), alpha(0.778<0.8), stopwords(1<2)
    assert(!r.getAs[Boolean]("r1_words"))
    assert(r.getAs[Boolean]("r2_word_len"))
    assert(!r.getAs[Boolean]("r3_symbols")) // 1/9 = 0.111 > 0.1
    assert(r.getAs[Boolean]("r4_bullets"))  // 0.5 <= 0.9
    assert(!r.getAs[Boolean]("r5_ellipsis")) // 0.5 > 0.3
    assert(!r.getAs[Boolean]("r6_alpha"))
    assert(!r.getAs[Boolean]("r7_stopwords"))
    assert(!r.getAs[Boolean]("keep"))
  }

  test("thresholds are inclusive: a boundary-exact document is kept") {
    // 10 words of mean length exactly 3.0, one '#' -> ratio exactly 0.1,
    // alpha fraction exactly 0.8 (8 of 10), stop hits exactly 2.
    // words: the(3) and(3) cat(3) sat(3) mat(3) pad(3) pad(3) pad(3) 123(3) #12(3)
    val text = "the and cat sat mat pad pad pad 123 #12"
    val cfg = GopherRules.Config(minWords = 10, maxWords = 10,
      minMeanWordLen = 3.0, maxMeanWordLen = 3.0, maxSymbolWordRatio = 0.1,
      minAlphaWordFrac = 0.8, minStopHits = 2)
    val r = auditOne(text, cfg)
    assert(r.getAs[Int]("n_words") == 10)
    assert(r.getAs[Double]("mean_word_len") == 3.0)
    assert(r.getAs[Double]("symbol_ratio") == 0.1)
    assert(r.getAs[Double]("alpha_frac") == 0.8)
    assert(r.getAs[Int]("stop_hits") == 2)
    assert(r.getAs[Boolean]("keep"), "every boundary-exact rule must pass (inclusive)")
  }

  test("blank document: zeroed signals, fails the word-count rule only as typed values") {
    val r = auditOne("   ")
    assert(r.getAs[Int]("n_words") == 0)
    assert(r.getAs[Double]("mean_word_len") == 0.0)
    assert(r.getAs[Double]("symbol_ratio") == 0.0)
    assert(r.getAs[Double]("alpha_frac") == 0.0)
    assert(r.getAs[Int]("stop_hits") == 0)
    assert(!r.getAs[Boolean]("r1_words") && !r.getAs[Boolean]("keep"))
  }

  test("distinct stopword presence, not occurrence count") {
    val r = auditOne("the the the the the the")
    assert(r.getAs[Int]("stop_hits") == 1, "repeats of one stopword count once")
  }

  test("filterDocs matches audit's keep set and keeps original columns") {
    val docs = Seq(
      (1L, "the cat and dog have sat with that mat be good", "a"),
      (2L, "1 2 3 4 5 6 7 8 9 10 11 12", "b"), // digits: fails alpha + word len
      (3L, "tiny", "c"))                        // fails word count
      .toDF("doc_id", "text", "tag")
    val cfg = GopherRules.Config(minWords = 5, minMeanWordLen = 2.0, minStopHits = 2)
    val kept = GopherRules.filterDocs(docs, "text", cfg)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "tag"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val auditKeep = GopherRules.audit(docs, "doc_id", "text", cfg)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSeq
    assert(auditKeep == Seq(1L))
  }

  test("filterDocs plans zero shuffles") {
    val docs = Seq((1L, "the cat and dog")).toDF("doc_id", "text")
    val plan = GopherRules.filterDocs(docs, "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopher filter must not shuffle:\n$plan")
  }

  test("config refusals") {
    intercept[IllegalArgumentException] {
      GopherRules.Config(minWords = 100, maxWords = 50)
    }
    intercept[IllegalArgumentException] {
      GopherRules.Config(minMeanWordLen = 5.0, maxMeanWordLen = 3.0)
    }
    intercept[IllegalArgumentException] {
      GopherRules.Config(minAlphaWordFrac = 1.5)
    }
    intercept[IllegalArgumentException] {
      GopherRules.Config(minStopHits = -1)
    }
  }

  test("fused signals kernel is value-identical to the column composite") {
    import org.apache.spark.sql.functions.{col, not}
    // edge cases for the kernel's single pass: blank/spaces (blank test is
    // SPACES-only trim), tab-led text (empty first token counts), bullets
    // and ellipses in every position, unicode letters + CJK (alpha uses
    // \p{L}), supplementary-plane chars (length counts code points),
    // symbol runs (non-overlapping '...' counts), stopword duplicates
    // (distinct presence), single-line and trailing-newline documents
    val edges = Seq("", " ", "   ", "\tword", "- bullet line\ntext…",
      "• b1\n* b2\n‣ b3\n▪ b4\n- b5", "ends...\nends…\n...mid...",
      "the the the be to of and that have with", "no stop words here",
      "héllo wörld 中文 文字", "😀 𝔘nicode 😀😀", "### ## #", ".....",
      "a\nb\nc\n", "\n\n", "one-line", "mixed - not bullet",
      "the quick brown fox jumps over the lazy dog and that is of to in",
      " \t mixed \r ", "a  b   c")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq
    val df = (edges ++ corpus).toDF("text")
    val kernel = graft.functions.GopherSignals.gopherSignals(col("text"))
    val composite = GopherRules.signalsColumns(col("text"))
    val mismatches = df.select(
        (composite.map { case (n, c) => c.as(s"c_$n") } ++
          composite.map { case (n, _) => kernel.getField(n).as(s"k_$n") }): _*)
      .filter(composite.map { case (n, _) =>
        not(col(s"c_$n") <=> col(s"k_$n")) }.reduce(_ || _))
      .count()
    assert(mismatches == 0)

    // and the one-call keep kernel agrees with the audit's conjunction
    // (two configs so non-default thresholds are exercised)
    Seq(GopherRules.Config(),
        GopherRules.Config(minWords = 1, minStopHits = 0,
          maxBulletLineFrac = 0.5, minAlphaWordFrac = 0.3)).foreach { cfg =>
      val ided = df.withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
      val viaFlag = ided.filter(GopherRules.keepFlag(col("text"), cfg))
        .select("doc_id").as[Long].collect().toSet
      val viaAudit = GopherRules.audit(ided, "doc_id", "text", cfg)
        .filter(col("keep")).select("doc_id").as[Long].collect().toSet
      assert(viaFlag == viaAudit)
    }
  }
}
