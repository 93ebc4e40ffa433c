package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.Num

/** Gopher document-quality rules (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", §A1.1) —
  * the canonical rule-based pre-training filter, sitting between the
  * composite [[TextAnalysis.qualityScore]] (a weighted score) and the
  * statistical LM gate ([[LangModel]]): seven independent structural
  * rules, each reported per document so a curation run can audit WHICH
  * rule dropped a page, not just that one did.
  *
  * Rules (all thresholds configurable; defaults are the paper's):
  *   1. word count within [minWords, maxWords]
  *   2. mean word length within [minMeanWordLen, maxMeanWordLen]
  *   3. symbol-to-word ratio (# or …) ≤ maxSymbolWordRatio
  *   4. fraction of lines starting with a bullet ≤ maxBulletLineFrac
  *   5. fraction of lines ending with an ellipsis ≤ maxEllipsisLineFrac
  *   6. fraction of words containing an alphabetic char ≥ minAlphaWordFrac
  *   7. at least minStopHits distinct signature stopwords present
  *
  * Everything is a per-row codegen'd column projection — zero shuffles,
  * zero UDFs; the whole audit is one narrow scan at any corpus size. All
  * fractions go through [[Num.dround]] so the frame hashes identically in
  * any engine (the dround rule, SURVEY §4).
  *
  * Reference analogue: the validation rule table of quality/Rules.scala
  * applied to corpus text (the reference repo — validation.py rule sets —
  * has no text module; this extends its rule-audit shape to documents).
  */
object GopherRules {

  /** Thresholds; defaults are Gopher §A1.1's published values. Boundary
    * discipline: every max is inclusive (≤), every min inclusive (≥) —
    * pinned by GopherRulesSpec so a threshold-equal document is KEPT. */
  final case class Config(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineFrac: Double = 0.9,
      maxEllipsisLineFrac: Double = 0.3,
      minAlphaWordFrac: Double = 0.8,
      minStopHits: Int = 2) {
    require(minWords >= 0 && maxWords >= minWords,
      s"word-count window invalid: [$minWords, $maxWords]")
    require(minMeanWordLen >= 0 && maxMeanWordLen >= minMeanWordLen,
      s"mean-word-length window invalid: [$minMeanWordLen, $maxMeanWordLen]")
    require(maxSymbolWordRatio >= 0 && maxBulletLineFrac >= 0 &&
      maxEllipsisLineFrac >= 0 && minAlphaWordFrac >= 0 && minAlphaWordFrac <= 1,
      "ratio thresholds must be non-negative (alpha fraction within [0,1])")
    require(minStopHits >= 0, s"minStopHits must be >= 0, got $minStopHits")
  }

  /** The paper's stopword signature: "the be to of and that have with". */
  val stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The seven signal columns over a text column, in audit order —
    * extracted from the fused one-pass kernel
    * ([[graft.functions.GopherSignals]], r14): the column composite below
    * ([[signalsColumns]], kept as the spec's equivalence oracle)
    * references the token/line arrays from CodegenFallback HOFs, which
    * drops the projection out of whole-stage codegen and re-evaluates the
    * split per reference. The seven struct-field extracts here share ONE
    * kernel call via codegen subexpression elimination. */
  private def signals(c: Column): Seq[(String, Column)] = {
    val k = graft.functions.GopherSignals.gopherSignals(c)
    Seq("n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
      "ellipsis_frac", "alpha_frac", "stop_hits").map(n => n -> k.getField(n))
  }

  /** The original built-in-column composite — retained as the equivalence
    * oracle for the fused kernel (GopherRulesSpec pins kernel ≡ composite
    * on edge cases and the real corpus). */
  private[graft] def signalsColumns(c: Column): Seq[(String, Column)] = {
    val blank = length(trim(c)) === 0
    val toks = TextAnalysis.tokens(c)
    val nWords = when(blank, lit(0)).otherwise(size(toks))
    val nWordsD = greatest(nWords.cast(DoubleType), lit(1.0))

    // Mean word length from an exact integer length sum — one linear pass.
    val lenSum = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    val meanLen = Num.dround(
      when(blank, lit(0.0)).otherwise(lenSum.cast(DoubleType) / nWordsD), 6)

    // '#' and non-overlapping '...' / '…' — the paper's symbol set.
    val symbols = regexp_count(c, lit("#")) +
      regexp_count(c, lit("\\.\\.\\.")) + regexp_count(c, lit("…"))
    val symbolRatio = Num.dround(symbols.cast(DoubleType) / nWordsD, 6)

    // Lines split on \n; a no-newline document is one line (frac 0 or 1).
    val lines = split(c, "\n")
    val nLinesD = greatest(size(lines).cast(DoubleType), lit(1.0))
    val bulletFrac = Num.dround(
      size(filter(lines, l => l.rlike("^\\s*[-*•‣▪]"))).cast(DoubleType) / nLinesD, 6)
    val ellipsisFrac = Num.dround(
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast(DoubleType) / nLinesD, 6)

    // Words containing at least one alphabetic character (Unicode letter —
    // a CJK corpus must not be all-dropped by an ASCII-only test).
    val alphaFrac = Num.dround(
      size(filter(toks, t => t.rlike("\\p{L}"))).cast(DoubleType) / nWordsD, 6)

    // DISTINCT stopword presence (the paper counts which of the 8 appear,
    // not total occurrences): 8 array_contains probes, no extra pass.
    val stopHits = stopwords.map(w =>
      when(array_contains(toks, w), lit(1)).otherwise(lit(0))).reduce(_ + _)

    Seq(
      "n_words" -> nWords, "mean_word_len" -> meanLen,
      "symbol_ratio" -> symbolRatio, "bullet_frac" -> bulletFrac,
      "ellipsis_frac" -> ellipsisFrac, "alpha_frac" -> alphaFrac,
      "stop_hits" -> stopHits)
  }

  /** The seven rule booleans over named signal columns. */
  private def rules(cfg: Config): Seq[(String, Column)] = Seq(
    "r1_words" -> (col("n_words") >= cfg.minWords && col("n_words") <= cfg.maxWords),
    "r2_word_len" -> (col("mean_word_len") >= cfg.minMeanWordLen &&
      col("mean_word_len") <= cfg.maxMeanWordLen),
    "r3_symbols" -> (col("symbol_ratio") <= cfg.maxSymbolWordRatio),
    "r4_bullets" -> (col("bullet_frac") <= cfg.maxBulletLineFrac),
    "r5_ellipsis" -> (col("ellipsis_frac") <= cfg.maxEllipsisLineFrac),
    "r6_alpha" -> (col("alpha_frac") >= cfg.minAlphaWordFrac),
    "r7_stopwords" -> (col("stop_hits") >= cfg.minStopHits))

  /** Per-document signal + rule audit.
    *
    * Output: idCol, n_words, mean_word_len, symbol_ratio, bullet_frac,
    * ellipsis_frac, alpha_frac, stop_hits, r1..r7 (one boolean per rule),
    * keep (conjunction). Blank documents get zeroed signals and fail the
    * word-count rule (nothing divides by zero; mean length of no words is
    * 0.0, not null, so the audit frame stays fully typed).
    */
  def audit(docs: DataFrame, idCol: String, textCol: String,
            cfg: Config = Config()): DataFrame = {
    val sig = signals(col(textCol))
    val ruleCols = rules(cfg)
    docs.select(col(idCol) +: sig.map { case (n, c) => c.as(n) }: _*)
      .select(col("*") +: ruleCols.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep", ruleCols.map(r => col(r._1)).reduce(_ && _))
  }

  /** Filter to kept documents (original columns intact) — the
    * curation-chain form of [[audit]]: the keep conjunction inlined as ONE
    * scan predicate, zero shuffles, no join (filters push to the source). */
  def filterDocs(docs: DataFrame, textCol: String,
                 cfg: Config = Config()): DataFrame = {
    // Rules reference signal columns by NAME; pack the signals into one
    // single scan predicate over the raw text — zero shuffles, no join;
    // the verdict is ONE kernel call per row (r14: FilterExec runs no
    // subexpression elimination, so the packed-struct form re-ran the
    // signal walk once per rule reference)
    docs.filter(keepFlag(col(textCol), cfg))
  }

  /** The keep conjunction as a standalone boolean column over raw text —
    * for callers that want the verdict WITHOUT dropping rows (the quality
    * panel reports it next to the other gates' verdicts). Same per-row
    * zero-shuffle shape as [[filterDocs]]: one fused-kernel call per row
    * ([[graft.functions.GopherSignals.gopherKeep]]); GopherRulesSpec pins
    * flag ≡ audit.keep on edge cases and the real corpus. */
  def keepFlag(text: Column, cfg: Config = Config()): Column =
    graft.functions.GopherSignals.gopherKeep(text,
      cfg.minWords, cfg.maxWords, cfg.minMeanWordLen, cfg.maxMeanWordLen,
      cfg.maxSymbolWordRatio, cfg.maxBulletLineFrac, cfg.maxEllipsisLineFrac,
      cfg.minAlphaWordFrac, cfg.minStopHits)

}
