package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text analysis for large-scale training-data pipelines (SURVEY §2.3 rows
  * 52-55): language ID, quality scoring, token counting, fingerprinting.
  *
  * Everything is pure `org.apache.spark.sql.functions` composition —
  * codegen'd, no UDFs, no shuffles; each operator is a scalar Column
  * usable inside any plan. (The reference repo has no text module; these
  * extend its QA surface to LLM-corpus preprocessing.)
  */
object TextAnalysis {

  /** Signature stopwords per language for the n-gram/stopword-hit
    * heuristic language classifier. Deliberately tiny and deterministic. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "una"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "une", "que"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Lowercased whitespace tokens. */
  def tokens(c: Column): Column = split(lower(trim(c)), "\\s+")

  /** Whitespace token count; empty/blank strings count 0. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** Compression-ratio quality signal: deflate(text).bytes / chars via
    * the codegen'd [[graft.functions.DeflateLen]] kernel — repetitive or
    * templated text compresses far below natural prose, so a low ratio
    * flags boilerplate with zero linguistic assumptions (the
    * RedPajama-v2/Dolma annotation family). Null/empty text → null. */
  def compressionRatio(c: Column): Column =
    when(length(c) > 0,
      graft.Num.dround(
        graft.functions.GraftFunctions.deflateLen(c).cast("double")
          / length(c).cast("double"), 4))

  /** BPE-ish regex token count: letter runs, single digits, or single
    * non-alphanumeric glyphs — the classic pre-tokenizer shape. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def regexTokenCount(c: Column): Column = regexp_count(c, lit(bpeTokenPattern))

  /** Stopword hits for one language's list. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(words.toArray), t)))

  /** Heuristic language ID: language with the most stopword hits; ties
    * resolve in the fixed order of [[stopwords]] ("und" beats "unknown").
    * Returns "unknown" when no list scores a hit.
    *
    * Evaluates through the fused native kernel
    * ([[graft.functions.LangId]], r14): the column composite below
    * references the token array from TEN CodegenFallback HOFs (five
    * vote filters × two references each), which drops the projection
    * out of whole-stage codegen and re-evaluates the split per
    * reference — the [[qualityScore]] pathology, squared.
    * [[languageIdColumns]] keeps the composite as the spec's
    * equivalence oracle. */
  def languageId(c: Column): Column =
    graft.functions.LangId.langId(c)

  /** The original built-in-column composite — retained as the
    * equivalence oracle for the fused kernel (TextSpec pins kernel ≡
    * composite on edge cases and the real corpus). */
  private[graft] def languageIdColumns(c: Column): Column = {
    val toks = tokens(c)
    val scores = stopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) }
    val best = greatest(scores.map(_._2): _*)
    val chain = scores.foldLeft(when(best <= 0, lit("unknown"))) {
      case (acc, (lang, s)) => acc.when(s === best, lit(lang))
    }
    chain.otherwise(lit("unknown"))
  }

  /** Composite quality score in [0,1] (length, punctuation noise, stopword
    * density, repetition), in the spirit of the reference's weighted data
    * health score (scoring.py:20-26):
    *   0.3·min(1, tokens/50) + 0.3·(1-punct_ratio) + 0.2·min(1, 5·stop_ratio)
    *   + 0.2·distinct_token_ratio, rounded to 4dp.
    *
    * Evaluates through the fused native kernel
    * ([[graft.functions.TextQuality]]): the column composite below
    * references the token array from four CodegenFallback HOFs, which
    * drops the projection out of whole-stage codegen and re-evaluates
    * the split per reference — measured 33.2 s vs the kernel's one
    * linear pass at the ×64 scale rung. [[qualityScoreColumns]] keeps
    * the composite as the spec's equivalence oracle. */
  def qualityScore(c: Column): Column =
    graft.functions.TextQuality.textQualityScore(c)

  /** The original built-in-column composite — retained as the
    * equivalence oracle for the fused kernel (TextSpec pins kernel ≡
    * composite on edge cases and the real corpus). */
  private[graft] def qualityScoreColumns(c: Column): Column = {
    val toks = tokens(c)
    val nTok = size(toks).cast(DoubleType)
    val punct = regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast(DoubleType)
    val chars = greatest(length(c).cast(DoubleType), lit(1.0))
    val stopHits = stopwordHits(toks, stopwords.toMap.apply("en")).cast(DoubleType)
    val distinctRatio = size(array_distinct(toks)).cast(DoubleType) / greatest(nTok, lit(1.0))
    val lenScore = least(lit(1.0), nTok / lit(50.0))
    val punctScore = lit(1.0) - least(lit(1.0), punct / chars)
    val stopScore = least(lit(1.0), stopHits / greatest(nTok, lit(1.0)) * 5.0)
    graft.Num.dround(lit(0.3) * lenScore + lit(0.3) * punctScore +
      lit(0.2) * stopScore + lit(0.2) * distinctRatio, 4)
  }

  /** Canonical content form: lowercase, strip everything but letters/
    * digits/whitespace (Unicode classes — CJK and accented text must NOT
    * collapse to the empty string, or a multilingual corpus dedups into one
    * giant false cluster), collapse whitespace. */
  def normalizeContent(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^\\p{L}\\p{N}\\s]", ""), "\\s+", " "))

  /** Portable 128-bit content fingerprint (md5 hex — identical in any
    * engine); use [[fingerprint64]] for the cheap in-engine variant. */
  def fingerprint(c: Column): Column = md5(normalizeContent(c).cast("binary"))

  /** 64-bit xxhash fingerprint — faster join key at 100 TB scale. */
  def fingerprint64(c: Column): Column = xxhash64(normalizeContent(c))

  /** Word n-grams as space-joined strings (n >= 1); fewer than n tokens →
    * empty array.
    *
    * Implementation note: zip_with over n shifted SLICES, not
    * transform(sequence)(i => element_at(toks, i+o)) — a lambda that
    * re-references the token array per element re-evaluates the split
    * under it per element after project collapsing (O(len²) per row; the
    * MinHash lesson, SURVEY §8). Each slice evaluates the split once, so
    * the whole n-gram column is n linear passes. */
  def ngrams(c: Column, n: Int): Column = ngramsOfTokens(tokens(c), n)

  /** [[ngrams]] over an already-tokenized array column — multi-detector
    * callers (the dedup_recall grader) materialize the token split once
    * and derive every detector's grams from it. */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"ngrams needs n >= 1, got $n")
    val len = greatest(size(toks) - lit(n - 1), lit(0))
    val parts = (0 until n).map(i => slice(toks, lit(i + 1), len))
    parts.reduce((acc, p) => zip_with(acc, p, (x, y) => concat_ws(" ", x, y)))
  }

  /** Corpus-wide top-k n-gram counts — the quick corpus-statistics pass of
    * an LLM data pipeline (boilerplate detection, template spotting).
    * Shape at 100 TB: explode → one keyed count with map-side combine (only
    * (ngram, partial count) shuffles, never documents) → global top-k via
    * sort-limit (Spark plans a per-partition TakeOrdered before the single
    * final merge). Ties break on the n-gram string. */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    docs.select(explode(ngrams(col(textCol), n)).as("ngram"))
      .filter(length(col("ngram")) > 0)
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)

  /** Per-document repetition signals in the spirit of the Gopher/C4
    * quality rules: duplicate-word fraction, duplicate-bigram fraction,
    * and mean word length. High duplicate-n-gram fractions are the
    * canonical boilerplate/spam detector for LLM corpus filtering.
    *
    * Pure per-row array arithmetic — no shuffle at any size (callers add
    * their own presentation sort if they want one): distinct counts come
    * from array_distinct over the token/bigram arrays (each evaluated
    * once per row; no per-element lambda re-references an outer array),
    * so a 100 TB corpus is one scan. Ratios are integer/integer —
    * engine-exact. Blank documents follow [[tokenCount]]: 0 tokens, all
    * signals 0. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col(textCol)
    val toks = tokens(c)
    val bgs = ngrams(c, 2)
    val nTok = size(toks).cast(DoubleType)
    val nBg = size(bgs).cast(DoubleType)
    val blank = length(trim(c)) === 0
    docs.select(
      col(idCol),
      when(blank, lit(0)).otherwise(size(toks)).as("n_tokens"),
      graft.Num.dround(
        when(blank, lit(0.0)).otherwise(
          (nTok - size(array_distinct(toks)).cast(DoubleType)) / nTok), 4)
        .as("dup_word_frac"),
      graft.Num.dround(
        when(blank || size(bgs) === 0, lit(0.0)).otherwise(
          (nBg - size(array_distinct(bgs)).cast(DoubleType)) / nBg), 4)
        .as("dup_bigram_frac"),
      graft.Num.dround(
        when(blank, lit(0.0)).otherwise(
          length(regexp_replace(trim(c), "\\s", "")).cast(DoubleType) / nTok), 4)
        .as("mean_word_len"))
  }

  /** Fraction of a document's characters covered by its single most
    * frequent word `n`-gram — the remaining Gopher repetition rule next to
    * [[repetitionSignals]]'s duplicate-n-gram fractions (high values mark
    * boilerplate/template spam). Coverage = top-gram occurrences × gram
    * length (spaces included) / trimmed document length, tie-broken to the
    * lexicographically smallest gram so the statistic is engine-portable.
    *
    * Relational shape (no per-row quadratic lambda): explode n-grams →
    * keyed (doc, gram) count → per-doc max count → equi-join back for the
    * tie-break → one final per-doc row. All aggregations partial map-side;
    * documents are never replicated beyond their own grams. Blank/short
    * docs (no n-gram) report 0. */
  def topNgramCharFraction(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame = {
    val grams = docs
      .select(col(idCol), explode(ngrams(col(textCol), n)).as("_gf_gram"))
      .filter(length(col("_gf_gram")) > 0)
    val cnts = grams.groupBy(col(idCol), col("_gf_gram"))
      .agg(count(lit(1)).as("_gf_cnt"))
    val mx = cnts.groupBy(idCol).agg(max("_gf_cnt").as("_gf_mcnt"))
    val pick = cnts.join(mx, Seq(idCol))
      .filter(col("_gf_cnt") === col("_gf_mcnt"))
      .groupBy(idCol)
      .agg(min("_gf_gram").as("_gf_g"), max("_gf_cnt").as("_gf_n"))
    docs.select(col(idCol),
        greatest(length(trim(col(textCol))).cast(DoubleType), lit(1.0)).as("_gf_chars"))
      .join(pick, Seq(idCol), "left")
      .select(col(idCol),
        graft.Num.dround(
          coalesce(col("_gf_n") * length(col("_gf_g")).cast(DoubleType) / col("_gf_chars"),
            lit(0.0)), 4).as(s"top${n}gram_char_frac"))
  }

  /** Per-document top-k terms by TF-IDF (idf = ln(N/df), raw tf) — the
    * standard keyword/topic fingerprint of a corpus. All-relational:
    * explode tokens → (doc, term) counts → per-term document frequency →
    * join back → per-doc window top-k. At 100 TB both aggregations carry
    * only keyed partial counts; the df side is a term dictionary, joined on
    * the term key (sort-merge when it outgrows broadcast). Rank ties break
    * on the term string, so the ordering is engine-portable wherever two
    * terms' (tf, df) pairs differ (a tfidf tie across DIFFERENT (tf, df)
    * pairs would need ln-ratio coincidences that integer inputs don't
    * produce). */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val terms = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfTerm = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val nDocs = docs.agg(countDistinct(col(idCol)).as("_gf_n"))
    val scored = tf.join(dfTerm, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast(DoubleType) *
          log(col("_gf_n").cast(DoubleType) / col("df_docs").cast(DoubleType)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df_docs"),
        graft.Num.dround(col("tfidf"), 4).as("tfidf"))
      .orderBy(col(idCol), col("rank"))
  }

  /** Non-overlapping occurrences of literal substring `s` — replace()
    * length arithmetic, the engine-portable way to count multi-byte
    * literals (regex-free: no escaping or unicode-class divergence). */
  def substrCount(c: Column, s: String): Column = {
    require(s.nonEmpty, "substrCount needs a non-empty needle")
    ((length(c) - length(replace(c, lit(s), lit("")))) / lit(s.length))
      .cast("long")
  }

  /** Common UTF-8-decoded-as-Latin-1 mojibake markers: 'Ã' (mangled
    * accented letters, e.g. 'é'→'Ã©'), 'â€' (mangled smart punctuation,
    * e.g. '’'→'â€™'), 'Â' (mangled NBSP/degree/copyright). Literal
    * substring counts, not regex, so both engines count identically. */
  val mojibakeMarkers: Seq[String] = Seq("Ã", "â€", "Â")

  /** Count of mojibake marker hits in the text. */
  def mojibakeCount(c: Column): Column =
    mojibakeMarkers.map(substrCount(c, _)).reduce(_ + _)

  /** Count of U+FFFD replacement characters (lossy transcoding scars). */
  def replacementCharCount(c: Column): Column = substrCount(c, "�")

  /** Count of non-whitespace C0 control characters (tab/LF/CR excluded)
    * — binary garbage embedded in "text". */
  def controlCharCount(c: Column): Column =
    regexp_count(c, lit("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"))

  /** Total encoding-artifact count — the ONE owner of the artifact sum
    * (audit verdict, pipeline keep predicate, and corpus health all read
    * this, so a new artifact class lands everywhere at once). NULL for
    * NULL text. */
  def artifactCount(c: Column): Column =
    mojibakeCount(c) + replacementCharCount(c) + controlCharCount(c).cast("long")

  /** The hygiene verdict: artifact-free AND present. NULL text is NOT
    * clean (no content is no evidence — the lm/ft-gate convention), so
    * filters on this never silently lose null-text rows from BOTH the
    * kept frame and the drop report. */
  def isCleanText(c: Column): Column =
    coalesce(artifactCount(c) === 0L, lit(false))

  /** Per-document encoding-artifact audit: mojibake markers, replacement
    * characters, stray control characters, and the combined verdict — the
    * corpus-hygiene gate every web-scraped training set needs before
    * tokenization (a mojibake'd corpus teaches the tokenizer phantom
    * vocabulary). Pure codegen'd projection: no shuffle, no UDF;
    * composes into any curation chain as a scan predicate. NULL text
    * emits NULL counts with `is_clean` false — represented, not lost. */
  def encodingAudit(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol),
        mojibakeCount(t).as("n_mojibake"),
        replacementCharCount(t).as("n_replacement"),
        controlCharCount(t).cast("long").as("n_control"),
        isCleanText(t).as("is_clean"))
  }
}
