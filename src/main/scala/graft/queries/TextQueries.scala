package graft.queries

import graft.Tables
import graft.dedup.LlmDedup
import graft.text.{GopherRules, TextAnalysis}
import org.apache.spark.sql.functions._

/** Driver-checked queries for SURVEY §2.3 rows 45 + 52-55 (text analysis
  * and exact dedup over the `documents` table). */
object TextQueries {

  private[queries] def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  /** DuckDB: per-language stopword hit count over whitespace tokens. */
  private[queries] def hitsSql(words: Seq[String]): String =
    s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t IN ${inList(words)}))"

  /** `s_<lang>` stopword-score SELECT-list — the columns [[langCaseSql]]
    * reads. Single owner for every language-ID oracle. */
  private[queries] def langScoresSql: String =
    TextAnalysis.stopwords
      .map { case (l, ws) => s"${hitsSql(ws)} AS s_$l" }.mkString(",\n  ")

  /** CASE over [[langScoresSql]]'s columns mirroring
    * `TextAnalysis.languageId`'s zero-hit fallback and tie-break order. */
  private[queries] def langCaseSql: String = {
    val langs = TextAnalysis.stopwords.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(",")})"
    val chain = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
    s"CASE WHEN $best <= 0 THEN 'unknown' $chain ELSE 'unknown' END"
  }

  /** Whitespace token count mirroring `TextAnalysis.tokenCount` (blank →
    * 0). Single owner — also reused by the mixture/packing/curation
    * oracles. */
  private[queries] def sqlTokenCount(textExpr: String = "text"): String =
    s"CASE WHEN length(trim($textExpr)) = 0 THEN 0 " +
      s"ELSE len(regexp_split_to_array(trim($textExpr), '\\s+')) END"

  /** Canonical text normalization mirroring `LlmDedup`/`fingerprint`
    * (lowercase, strip non-alnum, collapse whitespace, trim). Single
    * owner for every exact-dedup oracle. */
  private[queries] def sqlNormText(textExpr: String = "text"): String =
    s"trim(regexp_replace(regexp_replace(lower($textExpr), " +
      s"'[^\\p{L}\\p{N}\\s]', '', 'g'), '\\s+', ' ', 'g'))"

  /** DuckDB feature columns of [[TextAnalysis.qualityScore]] over a
    * relation exposing `text` — shared by text_quality and the curation
    * pipeline oracle so the formulas cannot drift apart. */
  private[queries] def qualityColsSql: String = {
    val en = inList(TextAnalysis.stopwords.toMap.apply("en"))
    s"""CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS n_tok,
       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS punct,
       greatest(CAST(length(text) AS DOUBLE), 1.0) AS chars,
       CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
         x -> x IN $en)) AS DOUBLE) AS stop_hits,
       CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS DOUBLE) AS n_distinct"""
  }

  /** DuckDB score formula over [[qualityColsSql]]'s columns. */
  private[queries] val qualityScoreSql: String =
    """floor((0.3 * least(1.0, n_tok / 50.0)
        + 0.3 * (1.0 - least(1.0, punct / chars))
        + 0.2 * least(1.0, stop_hits / greatest(n_tok, 1.0) * 5.0)
        + 0.2 * (n_distinct / greatest(n_tok, 1.0))) * 1e4 + 0.5) / 1e4"""

  /** LM-scoring CTE chain (no leading WITH) over arbitrary relations:
    * trains the bigram stupid-backoff model on `refRel(text)` and scores
    * `corpusRel(doc_id, text)`, ending in `lmagg(doc_id, n_scored,
    * avg_logprob)` — one row per corpus doc with ≥ 2 tokens. The single
    * DuckDB mirror of [[graft.text.LangModel]]'s train+score, shared by
    * text_lm_score, text_lm_buckets, and the curation-chain oracle so
    * the three gates cannot drift. CTE names are lm-prefixed (plus
    * reft/uni/tot/big) to compose inside larger oracles. */
  private[queries] def lmScoreCtes(refRel: String, corpusRel: String): String = s"""
        reft AS (
          SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS l
          FROM $refRel WHERE length(trim(text)) > 0),
        uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cw
                FROM (SELECT unnest(l) AS w FROM reft) GROUP BY 1),
        tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS t FROM uni),
        big AS (SELECT prev, w, CAST(count(*) AS BIGINT) AS cb FROM (
                  SELECT l[p] AS prev, l[p+1] AS w
                  FROM (SELECT l, unnest(generate_series(1, len(l)-1)) AS p
                        FROM reft WHERE len(l) >= 2))
                GROUP BY 1, 2),
        lmdoc AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS l
                FROM $corpusRel WHERE length(trim(text)) > 0),
        lmpairs AS (SELECT doc_id, l[p] AS prev, l[p+1] AS w
                  FROM (SELECT doc_id, l, unnest(generate_series(1, len(l)-1)) AS p
                        FROM lmdoc WHERE len(l) >= 2)),
        lmlp AS (SELECT doc_id,
                 floor((CASE
                    WHEN big.cb IS NOT NULL
                      THEN ln(CAST(big.cb AS DOUBLE) / CAST(up.cw AS DOUBLE))
                    WHEN uw.cw IS NOT NULL
                      THEN ln(0.4 * CAST(uw.cw AS DOUBLE) / t)
                    ELSE ln(0.4 / t) END) * 1e6 + 0.5) / 1e6 AS lp
               FROM lmpairs
               LEFT JOIN big USING (prev, w)
               LEFT JOIN uni up ON lmpairs.prev = up.w
               LEFT JOIN uni uw ON lmpairs.w = uw.w, tot),
        lmagg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored,
                  floor((CAST(sum(CAST(lp AS DECIMAL(38,6))) AS DOUBLE)
                         / count(*)) * 1e4 + 0.5) / 1e4 AS avg_logprob
                FROM lmlp GROUP BY 1)"""

  /** Mirror of the LM score queries' fixture: train on every 3rd doc,
    * score the rest (unscoreable docs surface with n_scored 0). */
  private val lmScoreOracleBody: String = s"""
        WITH lmref AS (SELECT text FROM documents WHERE doc_id % 3 = 0),
        lmcrawl AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        ${lmScoreCtes("lmref", "lmcrawl")}
        SELECT d.doc_id, coalesce(lmagg.n_scored, 0) AS n_scored, lmagg.avg_logprob
        FROM (SELECT doc_id FROM lmcrawl) d
        LEFT JOIN lmagg USING (doc_id)"""

  /** DuckDB mirror of [[graft.text.Dsir.logWeights]] on the driver
    * fixture (target = every 5th doc, raw = 5th+1, corpus = the rest;
    * string features, α = 1): unigram+bigram explode, Laplace-smoothed
    * log density ratio per gram (6dp), exact-decimal per-doc sum (4dp).
    * Ends as SELECT (doc_id, n_feats, log_weight). */
  private val dsirOracleBody: String = dsirBody(hashedBuckets = None)

  /** dsir oracle body, optionally with md5-portable feature hashing
    * (mirrors Dsir's portableHash lane: feature = h32(gram) % B, V = B). */
  private def dsirBody(hashedBuckets: Option[Int]): String = {
    val toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    def gramsOf(rel: String, withId: Boolean): String = {
      val id = if (withId) "doc_id, " else ""
      s"""SELECT ${id}g FROM (
            SELECT ${id}unnest(${Q.sqlNgrams("l", 1)} || ${Q.sqlNgrams("l", 2)}) AS g
            FROM (SELECT $id$toks AS l FROM $rel))
          WHERE length(g) > 0"""
    }
    val featOf = hashedBuckets
      .map(b => s"(${graft.ops.Hll.sqlH32("g")} % $b)").getOrElse("g")
    val vExpr = hashedBuckets
      .map(b => s"CAST($b AS DOUBLE)")
      .getOrElse("""(SELECT CAST(count(*) AS DOUBLE) FROM
                  (SELECT g FROM tcnt UNION SELECT g FROM rcnt))""")
    s"""
      WITH dtgt AS (SELECT text FROM documents WHERE doc_id % 5 = 0),
      draw AS (SELECT text FROM documents WHERE doc_id % 5 = 1),
      dcorp AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 >= 2),
      tg AS (${gramsOf("dtgt", withId = false)}),
      rg AS (${gramsOf("draw", withId = false)}),
      tcnt AS (SELECT $featOf AS g, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY 1),
      rcnt AS (SELECT $featOf AS g, CAST(count(*) AS BIGINT) AS c FROM rg GROUP BY 1),
      dk AS (SELECT
               (SELECT CAST(sum(c) AS DOUBLE) FROM tcnt) AS tt,
               (SELECT CAST(sum(c) AS DOUBLE) FROM rcnt) AS rt,
               $vExpr AS v),
      cgr0 AS (${gramsOf("dcorp", withId = true)}),
      cgr AS (SELECT doc_id, $featOf AS g FROM cgr0),
      dlr AS (SELECT doc_id,
                floor((ln((coalesce(tcnt.c, 0) + 1.0) / (tt + v))
                       - ln((coalesce(rcnt.c, 0) + 1.0) / (rt + v))) * 1e6 + 0.5) / 1e6 AS lr
              FROM cgr LEFT JOIN tcnt USING (g) LEFT JOIN rcnt USING (g), dk),
      dagg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                      floor(CAST(sum(CAST(lr AS DECIMAL(38,6))) AS DOUBLE) * 1e4 + 0.5) / 1e4 AS log_weight
               FROM dlr GROUP BY 1)
      SELECT c.doc_id, coalesce(dagg.n_feats, 0) AS n_feats, dagg.log_weight
      FROM (SELECT doc_id FROM dcorp) c LEFT JOIN dagg USING (doc_id)"""
  }

  // Planted non-Latin suffixes, \u-escaped so the source file stays
  // ASCII; the SAME Scala strings are interpolated into the DuckDB
  // oracle, so both engines profile identical codepoints.
  private val CyrSuffix =    // " privet mir" in Cyrillic
    " \u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440"
  private val HanSuffix =    // "ni hao shi jie" in Han
    " \u4f60\u597d\u4e16\u754c"
  private val GreekSuffix =  // "geia sou" in Greek
    " \u03b3\u03b5\u03b9\u03ac \u03c3\u03bf\u03c5"
  private val ArabicSuffix = // "marhaba" in Arabic
    " \u0645\u0631\u062d\u0628\u0627"

  val all: Seq[Q] = Seq(
    // Fixed-budget chunking with overlap — 64-token windows striding by
    // 48, the context-window prep step. Pure per-row projection (no
    // shuffle at any scale); the oracle mirrors tokenization, the
    // chunk-count formula, and the slicing in DuckDB SQL.
    Q("text_chunk",
      (s, dir) => graft.text.Chunking.chunk(Tables.documents(s, dir),
          "doc_id", "text", maxTokens = 64, overlap = 16)
        .orderBy("doc_id", "chunk_id"),
      Some(graft.text.Chunking.sqlChunk("documents", "doc_id", "text",
        maxTokens = 64, overlap = 16) + " ORDER BY doc_id, chunk_id")),

    // χ² keyword extraction per source (§2 row 177 — Manning & Schütze
    // §5.3.3): the terms that CHARACTERIZE each source against the rest
    // — per-(source, term) 2×2 document contingency, exact long cells
    // from one distinct-(doc, term) count, χ² a short IEEE chain,
    // top-5 per source (ties by term). The mixture-debugging view.
    // HASH-GREEN.
    Q("text_keywords_chi2",
      (s, dir) => graft.text.Vocab.keywordsChi2(
          Tables.documents(s, dir), "source", "text", k = 5, minDf = 5)
        .orderBy("source", "rank"),
      Some(s"""
        WITH kwtk AS (
          SELECT source, doc_id,
                 unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS term
          FROM documents),
        kwdf AS (SELECT source, term, CAST(count(*) AS BIGINT) AS df_in
                 FROM kwtk WHERE length(term) > 0 GROUP BY 1, 2),
        kwt AS (SELECT term, CAST(sum(df_in) AS BIGINT) AS dft
                FROM kwdf GROUP BY 1 HAVING sum(df_in) >= 5),
        kwng AS (SELECT source, CAST(count(*) AS BIGINT) AS ng
                 FROM documents GROUP BY 1),
        kwn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        kwc AS (SELECT d.source, d.term, d.df_in,
                  t.dft - d.df_in AS df_out,
                  g.ng - d.df_in AS cc,
                  n.n - g.ng - (t.dft - d.df_in) AS dd,
                  n.n AS n
                FROM kwdf d JOIN kwt t USING (term)
                JOIN kwng g USING (source), kwn n),
        kws AS (SELECT source, term, df_in, df_out,
                  CASE WHEN (CAST(df_in AS DOUBLE) + df_out) *
                            (CAST(cc AS DOUBLE) + dd) *
                            (CAST(df_in AS DOUBLE) + cc) *
                            (CAST(df_out AS DOUBLE) + dd) > 0 THEN
                    ${Q.sqlDround(
                      "CAST(n AS DOUBLE) * (CAST(df_in AS DOUBLE) * dd - CAST(df_out AS DOUBLE) * cc) * (CAST(df_in AS DOUBLE) * dd - CAST(df_out AS DOUBLE) * cc) / ((CAST(df_in AS DOUBLE) + df_out) * (CAST(cc AS DOUBLE) + dd) * (CAST(df_in AS DOUBLE) + cc) * (CAST(df_out AS DOUBLE) + dd))", 6)}
                  END AS chi2
                FROM kwc)
        SELECT source, term, df_in, df_out, chi2, rank FROM (
          SELECT *, CAST(row_number() OVER (PARTITION BY source
            ORDER BY chi2 DESC, term) AS INT) AS rank
          FROM kws WHERE chi2 IS NOT NULL) t
        WHERE rank <= 5 ORDER BY source, rank""")),

    // Token-mass-weighted corpus quantiles (§2 row 175): "below what
    // doc length does half the TOKEN MASS live?" — per source, doc
    // token-count quantiles weighted by the token count itself;
    // row-counted quantiles mislead when tokens are what the trainer
    // pays. Weighted histogram, p·W threshold on one IEEE multiply.
    // HASH-GREEN.
    Q("corpus_weighted_quantiles",
      (s, dir) => graft.ops.Quantiles.exactWeighted(
          Tables.documents(s, dir).select(col("source"),
            TextAnalysis.tokenCount(col("text")).as("toks")),
          "toks", "toks", Seq("source"), Seq(0.5, 0.9))
        .orderBy("source", "p"),
      Some(s"""
        WITH wqd AS (
          SELECT source, CAST(${sqlTokenCount()} AS DECIMAL(18,4)) AS v,
                 CAST(${sqlTokenCount()} AS BIGINT) AS w
          FROM documents),
        wqh AS (SELECT source, v, CAST(sum(w) AS BIGINT) AS c
                FROM wqd GROUP BY 1, 2),
        wqc AS (SELECT source, v, c,
                  sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
                  sum(c) OVER (PARTITION BY source) AS n
                FROM wqh),
        wqp AS (SELECT source, v, cum, n, p
                FROM wqc, (SELECT unnest([0.5, 0.9]) AS p) probes
                WHERE n > 0
                  AND CAST(cum AS DOUBLE) >= p * CAST(n AS DOUBLE))
        SELECT source, CAST(p AS DOUBLE) AS p,
               ${Q.sqlDround("CAST(min(v) AS DOUBLE)", 4)} AS value
        FROM wqp GROUP BY 1, 2 ORDER BY source, p""")),

    // Corpus concentration audit (§2 row 173): Gini + Pareto top-share
    // of token mass per source — does 1% of documents carry half the
    // tokens? The mixing-cap diagnostic; exact histogram arithmetic
    // (tied-block rank closed form, proportional straddle slice), no
    // corpus sort. The oracle replays histogram, rank sums, both
    // cumulative lanes, and the final chains. HASH-GREEN.
    Q("corpus_gini",
      (s, dir) => graft.profile.Distributions.gini(
          Tables.documents(s, dir).select(col("source"),
            TextAnalysis.tokenCount(col("text")).as("toks")),
          "toks", Seq("source"), topFraction = 0.01)
        .orderBy("source"),
      Some(s"""
        WITH gd AS (
          SELECT source, CAST(${sqlTokenCount()} AS DECIMAL(18,4)) AS v
          FROM documents),
        gh AS (SELECT source, v, CAST(count(*) AS BIGINT) AS c
               FROM gd GROUP BY 1, 2),
        gc AS (SELECT source, v, c,
                 sum(c) OVER (PARTITION BY source ORDER BY v) AS cumc,
                 sum(c) OVER (PARTITION BY source) AS n,
                 sum(c) OVER (PARTITION BY source ORDER BY v DESC) AS dcumc
               FROM gh),
        gx AS (SELECT source, v, c, cumc, n, dcumc,
                 v * CAST((cumc - c) * c + (c * (c + 1)) // 2
                          AS DECIMAL(16,0)) AS rv,
                 ceil(CAST(0.01 AS DOUBLE) * n) AS k
               FROM gc),
        ga AS (SELECT source, max(n) AS n,
                 CAST(round(sum(v * c), 2) AS DOUBLE) AS sv,
                 CAST(round(sum(rv), 2) AS DOUBLE) AS srv,
                 CAST(round(sum(
                   CASE WHEN dcumc <= k THEN v * c
                        WHEN dcumc - c < k
                          THEN v * CAST(k - (dcumc - c) AS DECIMAL(18,0))
                        ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
                   AS topv
               FROM gx GROUP BY 1)
        SELECT source, CAST(n AS BIGINT) AS n,
               ${Q.sqlDround("sv", 2)} AS total,
               CASE WHEN sv > 0 THEN ${Q.sqlDround(
                 "2.0 * srv / (CAST(n AS DOUBLE) * sv) - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)", 6)}
               END AS gini,
               CASE WHEN sv > 0 THEN ${Q.sqlDround("topv / sv", 6)}
               END AS top_share
        FROM ga ORDER BY source""")),

    Q("text_tokens",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("bpe_tokens"))
        .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id,
               CAST(${sqlTokenCount()} AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INT) AS bpe_tokens
        FROM documents ORDER BY doc_id""")),

    // Compression-ratio quality signal (rows-only: JDK zlib has no ANSI
    // form — deterministic for fixed input/level, pinned in TextSpec with
    // planted repetitive-vs-varied fixtures instead of a DuckDB oracle).
    Q("text_compress_ratio",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        graft.functions.GraftFunctions.deflateLen(col("text")).as("n_deflated"),
        TextAnalysis.compressionRatio(col("text")).as("compress_ratio"))
        .orderBy("doc_id"),
      None),

    Q("text_langid",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextAnalysis.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some(s"""
        SELECT doc_id, lang, $langCaseSql AS lang_pred
        FROM (SELECT doc_id, lang, $langScoresSql FROM documents)
        ORDER BY doc_id""")),

    Q("text_quality",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some(s"""
        WITH t AS (
          SELECT doc_id, $qualityColsSql
          FROM documents)
        SELECT doc_id, $qualityScoreSql AS quality
        FROM t ORDER BY doc_id""")),

    Q("text_fingerprint",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
                 '\s+', ' ', 'g'))) AS fingerprint
        FROM documents ORDER BY doc_id""")),

    // Exact dedup: clone every 5th doc with formatting noise (case +
    // trailing blanks), dedup by canonical fingerprint, keep min doc_id.
    Q("dedup_exact",
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val clones = d.filter(col("doc_id") % 5 === 0).select(
          (col("doc_id") + 1000000).as("doc_id"),
          upper(concat(col("text"), lit("  "))).as("text"))
        LlmDedup.exact(d.unionByName(clones), "text", "doc_id")
          .select("doc_id").orderBy("doc_id")
      },
      Some("""
        WITH u AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, upper(text || '  ') FROM documents WHERE doc_id % 5 = 0),
        n AS (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', '', 'g'),
                   '\s+', ' ', 'g')) AS norm
          FROM u)
        SELECT min(doc_id) AS doc_id FROM n GROUP BY norm ORDER BY doc_id""")),

    // Gopher/C4-style per-doc repetition quality signals.
    Q("text_repetition",
      (s, dir) => TextAnalysis.repetitionSignals(
        Tables.documents(s, dir), "doc_id", "text").orderBy("doc_id"),
      Some("""
        WITH t AS (
          SELECT doc_id,
                 regexp_split_to_array(lower(trim(text)), '\s+') AS l,
                 length(regexp_replace(trim(text), '\s', '', 'g')) AS nsp,
                 length(trim(text)) = 0 AS blank
          FROM documents),
        b AS (
          SELECT doc_id, l, nsp, blank,
                 CASE WHEN len(l) < 2 THEN CAST([] AS VARCHAR[])
                      ELSE list_transform(generate_series(1, len(l) - 1),
                                          i -> l[i] || ' ' || l[i + 1]) END AS bg
          FROM t)
        SELECT doc_id,
               CAST(CASE WHEN blank THEN 0 ELSE len(l) END AS INT) AS n_tokens,
               CASE WHEN blank THEN 0.0
                    ELSE floor(((CAST(len(l) AS DOUBLE) - CAST(len(list_distinct(l)) AS DOUBLE))
                        / CAST(len(l) AS DOUBLE)) * 1e4 + 0.5) / 1e4 END AS dup_word_frac,
               CASE WHEN blank OR len(bg) = 0 THEN 0.0
                    ELSE floor(((CAST(len(bg) AS DOUBLE) - CAST(len(list_distinct(bg)) AS DOUBLE))
                        / CAST(len(bg) AS DOUBLE)) * 1e4 + 0.5) / 1e4 END AS dup_bigram_frac,
               CASE WHEN blank THEN 0.0
                    ELSE floor((CAST(nsp AS DOUBLE) / CAST(len(l) AS DOUBLE)) * 1e4 + 0.5) / 1e4 END AS mean_word_len
        FROM b ORDER BY doc_id""")),

    // CCNet-style LM quality gate: a bigram stupid-backoff model trained
    // on the trusted slice (every 3rd doc), the rest scored by average
    // conditioned log-prob. Hash-checked end to end — counts, backoff
    // cases, OOV floor, and the decimal-sum average all mirror in SQL.
    Q("text_lm_score",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val lm = graft.text.LangModel.train(
          docs.filter(col("doc_id") % 3 === 0), "text")
        graft.text.LangModel.score(
            docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", lm)
          .orderBy("doc_id")
      },
      Some(s"$lmScoreOracleBody ORDER BY doc_id")),

    // CCNet's actual decision shape: head/middle/tail terciles of the LM
    // score (Wenzek et al. keep/inspect/drop by perplexity bucket). The
    // exact ntile path (total order on (score, doc_id)) is the
    // oracle-parity route; Binning's approx edges are the 100 TB route.
    Q("text_lm_buckets",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val lm = graft.text.LangModel.train(
          docs.filter(col("doc_id") % 3 === 0), "text")
        val scored = graft.text.LangModel.score(
          docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", lm)
        graft.ops.Binning.equalFrequency(
            scored.filter(col("avg_logprob").isNotNull),
            "avg_logprob", q = 3, tiebreak = Seq("doc_id"),
            exact = true, outCol = "bucket")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH base AS ($lmScoreOracleBody)
        SELECT doc_id, n_scored, avg_logprob,
               CAST(ntile(3) OVER (ORDER BY avg_logprob, doc_id) AS INT) AS bucket
        FROM base WHERE avg_logprob IS NOT NULL
        ORDER BY doc_id""")),

    // DSIR importance weights (Xie et al. 2023): bag-of-ngrams log
    // density ratio between a target slice (every 5th doc) and a raw
    // slice (5th+1), scored over the rest. String features — the
    // oracle-parity lane; the hashed-bucket lane (the paper's actual
    // feature space) is dsir_hashed below.
    Q("dsir_weights",
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "text")
        graft.text.Dsir.logWeights(
            d.filter(col("doc_id") % 5 >= 2), "doc_id", "text",
            target = d.filter(col("doc_id") % 5 === 0),
            raw = d.filter(col("doc_id") % 5 === 1))
          .orderBy("doc_id")
      },
      Some(s"$dsirOracleBody ORDER BY doc_id")),

    // The resampling step, deterministic limit form: top-64 docs by
    // importance weight (ties on id) — the noise-free Gumbel limit,
    // planned as TakeOrdered (per-partition top-k + one k-sized merge),
    // never a global single-partition window.
    Q("dsir_select",
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val w = graft.text.Dsir.logWeights(
          d.filter(col("doc_id") % 5 >= 2), "doc_id", "text",
          target = d.filter(col("doc_id") % 5 === 0),
          raw = d.filter(col("doc_id") % 5 === 1))
        graft.text.Dsir.selectTop(w, "doc_id", k = 64).orderBy("doc_id")
      },
      Some(s"""
        WITH base AS ($dsirOracleBody)
        SELECT doc_id, n_feats, log_weight FROM base
        WHERE log_weight IS NOT NULL
        QUALIFY row_number() OVER (ORDER BY log_weight DESC, doc_id) <= 64
        ORDER BY doc_id""")),

    // The paper's actual feature space: unigram+bigram counts hashed
    // into 1024 buckets (pmod(xxhash64, B)) with V = B smoothing — the
    // 100 TB lane, where both count tables are at most B rows and always
    // broadcast. Rows-only (xxhash64 has no SQL twin; DsirSpec pins the
    // hashed lane's estimator against the string lane on a
    // collision-free fixture).
    Q("dsir_hashed",
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "text")
        graft.text.Dsir.logWeights(
            d.filter(col("doc_id") % 5 >= 2), "doc_id", "text",
            target = d.filter(col("doc_id") % 5 === 0),
            raw = d.filter(col("doc_id") % 5 === 1),
            buckets = Some(1024))
          .orderBy("doc_id")
      },
      None),

    // The hashed DSIR lane made verifiable (the PortableMinHash
    // treatment): features = h32(gram) % 1024 via the md5-prefix fold,
    // V = B smoothing — same estimator, same broadcast-count-table
    // plan, but every feature id, both count tables, and the smoothed
    // log-ratio chain replay in DuckDB. HASH-GREEN; dsir_hashed keeps
    // the xxhash64 production lane (DsirSpec pins the two lanes'
    // estimator equivalence on a collision-free fixture).
    Q("dsir_hashed_portable",
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "text")
        graft.text.Dsir.logWeights(
            d.filter(col("doc_id") % 5 >= 2), "doc_id", "text",
            target = d.filter(col("doc_id") % 5 === 0),
            raw = d.filter(col("doc_id") % 5 === 1),
            buckets = Some(1024), portableHash = true)
          .orderBy("doc_id")
      },
      Some(s"${dsirBody(hashedBuckets = Some(1024))} ORDER BY doc_id")),

    // The third LM route under the gate: count tables collected into
    // in-memory maps and shipped with the serialized LmScoreRow kernel —
    // each doc scores in ONE projection, no join, no doc-keyed exchange
    // (CCNet's operational shape, and what makes the gate streamable).
    // Same oracle as text_lm_score: all three routes provably identical.
    Q("text_lm_broadcast",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val lm = graft.text.LangModel.train(
          docs.filter(col("doc_id") % 3 === 0), "text")
        graft.text.LangModel.scoreBroadcast(
            docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", lm)
          .orderBy("doc_id")
      },
      Some(s"$lmScoreOracleBody ORDER BY doc_id")),

    // The LM lifecycle under the gate: train on the trusted slice,
    // PERSIST the count tables (manifest-tagged), re-open from disk, and
    // score the crawl with the re-opened model — hash-checked against
    // the SAME oracle as text_lm_score, so the persisted round trip is
    // proven value-identical, not just readable.
    Q("text_lm_persisted",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val trained = graft.text.LangModel.train(
          docs.filter(col("doc_id") % 3 === 0), "text")
        val path = NearDupQueries.scratchIndexDir(s, "lmmodel", dir)
        graft.text.LangModel.writeModel(trained, path)
        trained.release()
        val lm = graft.text.LangModel.readModel(s, path)
        graft.text.LangModel.score(
            docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text", lm)
          .orderBy("doc_id")
      },
      Some(s"$lmScoreOracleBody ORDER BY doc_id")),

    // BPE lifecycle twin: train, persist the merge table, re-open, and
    // encode with the re-opened model. Rows-only like bpe_train_encode
    // (same reason); BpeSpec pins the round trip rule-for-rule.
    Q("bpe_encode_persisted",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val model = graft.text.Bpe.train(docs, "text", numMerges = 40)
        val path = NearDupQueries.scratchIndexDir(s, "bpemodel", dir)
        graft.text.Bpe.writeModel(s, model, path)
        val reopened = graft.text.Bpe.readModel(s, path)
        graft.text.Bpe.encode(docs, "doc_id", "text", reopened)
          .select(col("doc_id"), col("n_words"), col("n_subwords"))
          .orderBy("doc_id")
      },
      None),

    // The distributed half of BPE training, oracle-checked: weighted
    // adjacent-symbol pair counts over the corpus word vocabulary
    // (chars + the </w> terminal) — exactly the table the trainer's
    // round 0 picks its first merge from. Top-30 with a total-order
    // tie-break. The merge LOOP itself is vocab-bounded driver work
    // pinned by BpeSpec's hand-derived classic fixture.
    Q("bpe_pair_counts",
      (s, dir) => {
        val wc = graft.text.Bpe.wordCounts(
          Tables.documents(s, dir).select("text"), "text")
        val syms = concat(
          transform(sequence(lit(1), length(col("_gf_w"))),
            i => col("_gf_w").substr(i, lit(1))),
          array(lit(graft.text.Bpe.EndOfWord)))
        val n = size(syms)
        val pairs = zip_with(
          slice(syms, lit(1), n - 1), slice(syms, lit(2), n - 1),
          (a, b) => struct(a.as("sym_a"), b.as("sym_b")))
        wc.select(col("_gf_c"), explode(pairs).as("_gf_p"))
          .groupBy(col("_gf_p.sym_a").as("sym_a"), col("_gf_p.sym_b").as("sym_b"))
          .agg(sum(col("_gf_c")).as("pair_count"))
          .orderBy(col("pair_count").desc, col("sym_a"), col("sym_b"))
          .limit(30)
      },
      Some("""
        WITH wc AS (
          SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
            FROM documents)
          WHERE length(w) > 0 GROUP BY 1),
        sy AS (SELECT c, list_append(
                 list_transform(generate_series(1, length(w)), i -> w[i]),
                 '</w>') AS s
               FROM wc),
        pr AS (SELECT c, s[i] AS sym_a, s[i+1] AS sym_b
               FROM (SELECT c, s, unnest(generate_series(1, len(s) - 1)) AS i
                     FROM sy)),
        ag AS (SELECT sym_a, sym_b, CAST(sum(c) AS BIGINT) AS pair_count
               FROM pr GROUP BY 1, 2)
        SELECT sym_a, sym_b, pair_count FROM ag
        ORDER BY pair_count DESC, sym_a, sym_b LIMIT 30""")),

    // Full BPE lifecycle: train 40 merges on the corpus vocabulary, then
    // encode every document through the native BpeEncode expression.
    // Rows-only (the iterative merge loop has no ANSI form; BpeSpec pins
    // it on the paper's classic fixture) but fully deterministic — the
    // trainer's tie-breaks are a total order.
    Q("bpe_train_encode",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val model = graft.text.Bpe.train(docs, "text", numMerges = 40)
        graft.text.Bpe.encode(docs, "doc_id", "text", model)
          .select(col("doc_id"), col("n_words"), col("n_subwords"))
          .orderBy("doc_id")
      },
      None),

    // BM25 lexical retrieval: the first 5 docs as queries against the
    // whole corpus, top-5 each — the inverted-index join shape with every
    // constant expression mirrored operation-for-operation in SQL
    // ((1.2 + 1.0), (1 - 0.75 + 0.75·len/avgdl), Lucene idf), 6dp
    // per-term rounding + exact-decimal sums, avgdl from an exact long
    // sum. (No self-find claim: on this homogeneous-vocabulary corpus
    // BM25 rightly favors term frequency over identity — Bm25Spec pins
    // self-find on a distinctive-vocabulary fixture instead.)
    Q("text_bm25",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.text.Bm25.topK(docs, "doc_id", "text",
            docs.filter(col("doc_id") < 5)
              .select(col("doc_id").as("qid"), col("text")),
            "qid", "text", k = 5)
          .orderBy("query_id", "rank")
      },
      Some("""
        WITH base AS (
          SELECT doc_id AS did, regexp_split_to_array(lower(trim(text)), '\s+') AS l
          FROM documents WHERE length(trim(text)) > 0),
        lens AS (SELECT did, len(l) AS dlen, l FROM base),
        post AS (SELECT term, did, dlen, CAST(count(*) AS BIGINT) AS tf
                 FROM (SELECT did, dlen, unnest(l) AS term FROM lens)
                 WHERE length(term) > 0 GROUP BY 1, 2, 3),
        dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post GROUP BY 1),
        stats AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                         CAST(sum(dlen) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
                  FROM lens),
        qt AS (SELECT DISTINCT qid, term FROM (
                 SELECT doc_id AS qid,
                        unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
                 FROM documents WHERE doc_id < 5 AND length(trim(text)) > 0)
               WHERE length(term) > 0),
        per AS (SELECT qt.qid, post.did,
                  floor((ln(1 + (n - df + 0.5) / (df + 0.5))
                         * tf * (1.2 + 1.0)
                         / (tf + 1.2 * (1 - 0.75 + 0.75 * dlen / avgdl)))
                        * 1e6 + 0.5) / 1e6 AS s
                FROM post JOIN qt USING (term) JOIN dfq USING (term), stats),
        agg AS (SELECT qid, did,
                  CAST(round(sum(CAST(s AS DECIMAL(38,6))), 4) AS DOUBLE) AS score
                FROM per GROUP BY 1, 2),
        rk AS (SELECT qid, did, score,
                 row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS rank
               FROM agg)
        SELECT qid AS query_id, CAST(rank AS INT) AS rank, did AS doc_id, score
        FROM rk WHERE rank <= 5
        ORDER BY query_id, rank""")),

    // Per-document top-3 TF-IDF terms.
    Q("text_tfidf",
      (s, dir) => TextAnalysis.tfIdfTopTerms(
        Tables.documents(s, dir), "doc_id", "text", k = 3),
      Some("""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               WHERE length(term) > 0 GROUP BY 1, 2),
        dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY 1),
        n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS nd FROM documents),
        scored AS (
          SELECT tf.doc_id, tf.term, tf.tf, dfq.df_docs,
                 CAST(tf.tf AS DOUBLE) * ln(nd / CAST(dfq.df_docs AS DOUBLE)) AS tfidf
          FROM tf JOIN dfq USING (term), n),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
          FROM scored)
        SELECT doc_id, CAST(rnk AS INT) AS rank, term, tf, df_docs,
               floor(tfidf * 1e4 + 0.5) / 1e4 AS tfidf
        FROM ranked WHERE rnk <= 3 ORDER BY doc_id, rnk""")),

    // Gopher's remaining repetition rule: per-doc character coverage of
    // the single most frequent 2-/3-/4-gram.
    Q("text_topgram",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        Seq(2, 3, 4)
          .map(n => TextAnalysis.topNgramCharFraction(d, "doc_id", "text", n))
          .reduce(_.join(_, Seq("doc_id")))
          .orderBy("doc_id")
      },
      Some {
        def per(n: Int): String =
          s"""g$n AS (SELECT doc_id, unnest(${Q.sqlNgrams("l", n)}) AS gram FROM t),
              c$n AS (SELECT doc_id, gram, count(*) AS cnt FROM g$n
                      WHERE length(gram) > 0 GROUP BY 1, 2),
              m$n AS (SELECT doc_id, max(cnt) AS mcnt FROM c$n GROUP BY 1),
              p$n AS (SELECT c.doc_id, min(c.gram) AS g, max(c.cnt) AS n
                      FROM c$n c JOIN m$n m ON c.doc_id = m.doc_id AND c.cnt = m.mcnt
                      GROUP BY 1)"""
        def frac(n: Int): String =
          s"floor(coalesce(p$n.n * CAST(length(p$n.g) AS DOUBLE) / t.chars, 0.0) * 1e4 + 0.5) / 1e4 AS top${n}gram_char_frac"
        s"""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS l,
                 greatest(CAST(length(trim(text)) AS DOUBLE), 1.0) AS chars
          FROM documents),
        ${per(2)}, ${per(3)}, ${per(4)}
        SELECT t.doc_id, ${frac(2)}, ${frac(3)}, ${frac(4)}
        FROM t LEFT JOIN p2 ON t.doc_id = p2.doc_id
               LEFT JOIN p3 ON t.doc_id = p3.doc_id
               LEFT JOIN p4 ON t.doc_id = p4.doc_id
        ORDER BY t.doc_id"""
      }),

    // Corpus-wide top-20 word bigrams.
    Q("text_ngrams",
      (s, dir) => TextAnalysis.topNgrams(Tables.documents(s, dir), "text", n = 2, k = 20),
      Some("""
        WITH toks AS (
          SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS l FROM documents),
        grams AS (
          SELECT unnest(CASE WHEN len(l) < 2 THEN CAST([] AS VARCHAR[])
                             ELSE list_transform(generate_series(1, len(l) - 1),
                                                 i -> l[i] || ' ' || l[i + 1]) END) AS ngram
          FROM toks)
        SELECT ngram, count(*) AS cnt FROM grams WHERE length(ngram) > 0
        GROUP BY 1 ORDER BY cnt DESC, ngram LIMIT 20""")),

    // Gopher rule audit (Rae et al. §A1.1). The corpus is single-line
    // clean prose, so each structural rule is exercised by a deterministic
    // derived variant: bullet-list, ellipsis-joined, symbol-spiked,
    // digits-only, truncated, and stopword-enriched rewrites of mod-7
    // bands (disjoint id offsets — the dedup_exact clone pattern).
    Q("text_gopher_rules",
      (s, dir) => {
        val outCols = Seq("doc_id", "n_words", "mean_word_len", "symbol_ratio",
          "bullet_frac", "ellipsis_frac", "alpha_frac", "stop_hits").map(col) ++
          (ruleNames :+ "keep").map(n => col(n).cast("int").as(n))
        GopherRules.audit(
            gopherFixture(Tables.documents(s, dir)), "doc_id", "text", gopherCfg)
          .select(outCols: _*).orderBy("doc_id")
      },
      Some(s"""
        $gopherAuditSql
        SELECT * FROM audit ORDER BY doc_id""")),

    // The filter form: kept ids only, pinning GopherRules.filterDocs'
    // zero-shuffle predicate against the same oracle's keep conjunction.
    Q("text_gopher_filter",
      (s, dir) => GopherRules.filterDocs(
          gopherFixture(Tables.documents(s, dir)), "text", gopherCfg)
        .select("doc_id").orderBy("doc_id"),
      Some(s"""
        $gopherAuditSql
        SELECT doc_id FROM audit WHERE keep = 1 ORDER BY doc_id""")),

    // Tokenizer-consistent chunking under an ENGINE-TRAINED BPE model —
    // the budget is denominated in the subword units the trainer sees,
    // not whitespace words. Rows-only (the iterative merge loop has no
    // ANSI form — the bpe_train_encode precedent); the algebra is
    // hash-checked by text_chunk_bpe_handed and the persisted round trip
    // is byte-pinned in ChunkingSpec.
    Q("text_chunk_bpe",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val model = graft.text.Bpe.train(docs, "text", numMerges = 40)
        graft.text.Chunking.chunkBpe(docs, "doc_id", "text", model,
            budget = 128)
          .orderBy("doc_id", "chunk_id")
      },
      None),

    // The same chunker HASH-CHECKED under a handed two-rule merge table
    // (the Pq handed-codebook precedent): rules (t,h) and (e,r) have
    // disjoint single-char sides, so greedy BPE has the closed form
    // |w|+1 − occ("th") − occ("er") per word — SQL-expressible via
    // replace(), the full cumsum/bucket/densify pipeline mirrored in
    // window SQL.
    Q("text_chunk_bpe_handed",
      (s, dir) => graft.text.Chunking.chunkBpe(
          Tables.documents(s, dir), "doc_id", "text", handedBpe,
          budget = 128)
        .orderBy("doc_id", "chunk_id"),
      Some(s"""
        WITH wl AS (
          SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   x -> length(x) > 0) AS ws
          FROM documents WHERE length(trim(text)) > 0),
        wrd AS (
          SELECT doc_id, unnest(ws) AS word,
                 unnest(generate_series(1, len(ws))) AS i
          FROM wl),
        wc AS (
          SELECT doc_id, i, word,
                 ${sqlHandedBpeCost("lower(word)")} AS cost
          FROM wrd),
        cum AS (
          SELECT doc_id, i, word, cost,
                 sum(cost) OVER (PARTITION BY doc_id ORDER BY i) AS c
          FROM wc),
        bk AS (
          SELECT doc_id, i, word, cost,
                 CAST(floor((c - cost) / 128.0) AS BIGINT) AS b
          FROM cum),
        dn AS (
          SELECT doc_id, i, word, cost,
                 dense_rank() OVER (PARTITION BY doc_id ORDER BY b) - 1 AS cid
          FROM bk)
        SELECT doc_id, CAST(cid AS INT) AS chunk_id,
               string_agg(word, ' ' ORDER BY i) AS chunk_text,
               CAST(count(*) AS INT) AS n_words,
               CAST(sum(cost) AS BIGINT) AS n_tokens
        FROM dn GROUP BY doc_id, cid
        ORDER BY doc_id, chunk_id""")),

    // fastText-style quality scoring (Joulin et al. 2016) under a HANDED
    // string-keyed weight table — the CCNet/GPT-3 gate family's inference
    // path, hash-checked end to end: grams explode + broadcast weight
    // join + exact-decimal mean + sigmoid on the already-rounded
    // activation (the ln/pow-on-rounded-args oracle precedent).
    Q("text_ft_score",
      (s, dir) => {
        val sp = s; import sp.implicits._
        val weights = ftHandedWeights.toDF("feature", "weight")
        graft.text.FastText.score(Tables.documents(s, dir), "doc_id",
            "text", weights, bias = ftHandedBias)
          .orderBy("doc_id")
      },
      Some(s"$ftScoreOracleBody ORDER BY doc_id")),

    // The TRAINED fastText gate, CCNet's actual recipe: positives = the
    // clean corpus (the "trusted reference" role), negatives = a
    // deterministic junk corruption of it (truncated text + spam
    // tokens — the gopherFixture rewrite pattern; this synthetic
    // corpus's lang/source columns are NOT text-correlated, so a real
    // class boundary has to be planted). Full-batch logistic regression
    // over hashed unigram+bigram features (B-bounded weight table, the
    // paper's linearly-decaying lr), then the hashed broadcast scoring
    // route over the mixed frame. Rows-only (xxhash64 buckets + an
    // iterative fit have no ANSI form); FastTextSpec pins convergence,
    // hashed≡string route equality, and separation.
    Q("text_ft_train_score",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val toks = TextAnalysis.tokens(col("text"))
        val neg = docs.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(concat_ws(" ", slice(toks, 1, 6)),
            lit(" zz9 qq7 xx3 zz9 qq7 xx3 vv2 kk8 vv2")).as("text"))
        val labeled = docs.withColumn("label", lit(1.0))
          .unionByName(neg.withColumn("label", lit(0.0)))
        val m = graft.text.FastText.train(labeled, "text", "label",
          buckets = 1024, epochs = 12, lr = 40.0)
        graft.text.FastText.scoreHashed(labeled, "doc_id", "text",
            m.weightFrame(s), m.bias, buckets = 1024)
          .orderBy("doc_id")
      },
      None),

    // The minibatch training lane — the same planted class boundary as
    // text_ft_train_score, but each epoch trains on a DETERMINISTIC hash
    // sample of the docs (Sampling.hashSample, seed = epoch), the 100 TB
    // epoch-cost bound: per-epoch join/aggregate volume is
    // fraction-bounded instead of corpus-sized. More epochs at a quarter
    // of the data ≈ the full-batch pass count, so the gate still
    // separates. Rows-only (xxhash64 + iterative fit); FastTextSpec pins
    // convergence, determinism, and full-batch equivalence at 1.0.
    Q("text_ft_train_minibatch",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val toks = TextAnalysis.tokens(col("text"))
        val neg = docs.select((col("doc_id") + 1000000L).as("doc_id"),
          concat(concat_ws(" ", slice(toks, 1, 6)),
            lit(" zz9 qq7 xx3 zz9 qq7 xx3 vv2 kk8 vv2")).as("text"))
        val labeled = docs.withColumn("label", lit(1.0))
          .unionByName(neg.withColumn("label", lit(0.0)))
        val m = graft.text.FastText.train(labeled, "text", "label",
          buckets = 1024, epochs = 12, lr = 40.0, minibatchFraction = 0.25)
        graft.text.FastText.scoreHashed(labeled, "doc_id", "text",
            m.weightFrame(s), m.bias, buckets = 1024)
          .orderBy("doc_id")
      },
      None),

    // The persisted-classifier lifecycle: train, persist the B-bounded
    // weight table with a format-tagged manifest, re-open, score through
    // the re-opened model. Rows-only like text_ft_train_score;
    // FastTextSpec pins the round trip byte-for-byte and the refusal
    // ladder (missing manifest / foreign format / truncated weights /
    // out-of-range buckets).
    Q("text_ft_persisted",
      (s, dir) => {
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val labeled = docs.withColumn("label",
          when(col("doc_id") % 2 === 0, 1.0).otherwise(0.0))
        val m = graft.text.FastText.train(labeled, "text", "label",
          buckets = 1024, epochs = 4, lr = 10.0)
        val path = NearDupQueries.scratchIndexDir(s, "ftmodel", dir)
        graft.text.FastText.writeModel(s, m, path)
        val loaded = graft.text.FastText.readModel(s, path)
        loaded.score(docs, "doc_id", "text").orderBy("doc_id")
      },
      None),

    // The broadcast-KERNEL route under the same handed weight table —
    // the same oracle as text_ft_score, so the shipped-map
    // FtScoreRow projection (no join, no per-doc exchange; what makes
    // the gate streamable) is proven value-identical to the join route
    // against DuckDB end-to-end (the text_lm_broadcast precedent).
    Q("text_ft_broadcast",
      (s, dir) => {
        val sp = s; import sp.implicits._
        graft.text.FastText.scoreBroadcast(Tables.documents(s, dir),
            "doc_id", "text", ftHandedWeights.toDF("feature", "weight"),
            bias = ftHandedBias)
          .orderBy("doc_id")
      },
      Some(s"$ftScoreOracleBody ORDER BY doc_id")),

    // Duplication-mass histogram (SURVEY row 132): how much of the corpus
    // is redundant, by exact-duplicate cluster size — the first number a
    // dedup plan is sized from. Same clone fixture as dedup_exact so the
    // histogram has real mass; two keyed aggregations, the first on the
    // 128-bit content fingerprint (the only corpus-sized exchange — text
    // itself never shuffles), the second on the bounded size domain.
    Q("dedup_exact_sizes",
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "text")
        val clones = d.filter(col("doc_id") % 5 === 0).select(
          (col("doc_id") + 1000000).as("doc_id"),
          upper(concat(col("text"), lit("  "))).as("text"))
        d.unionByName(clones)
          .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size")
          .agg(count(lit(1)).as("n_clusters"))
          .select(col("cluster_size"), col("n_clusters"),
            (col("cluster_size") * col("n_clusters")).as("n_docs"),
            ((col("cluster_size") - 1L) * col("n_clusters")).as("n_redundant"))
          .orderBy("cluster_size")
      },
      Some(s"""
        WITH u AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000, upper(text || '  ') FROM documents WHERE doc_id % 5 = 0),
        cl AS (
          SELECT md5(${sqlNormText("text")}) AS fp,
                 CAST(count(*) AS BIGINT) AS cluster_size
          FROM u GROUP BY 1)
        SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(cluster_size * count(*) AS BIGINT) AS n_docs,
               CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_redundant
        FROM cl GROUP BY cluster_size ORDER BY cluster_size""")),

    // Tokenizer fertility by language (SURVEY row 133): subwords-per-word
    // under the BPE model — the standard tokenizer-fairness audit (a
    // language with high fertility pays more context budget per word).
    // HASH-GREEN under the handed merge table (closed replace()-arithmetic
    // form); the engine-trained lane is Bpe.encode with any model. One
    // grouped pass; both counts are codegen'd projections on the scan.
    Q("bpe_fertility",
      (s, dir) => {
        val toks = TextAnalysis.tokens(col("text"))
        val words = size(filter(toks, w => length(w) > 0)).cast("long")
        val subwords = size(graft.functions.BpeEncodeFun.bpeEncode(
          col("text"), handedBpe.merges)).cast("long")
        Tables.documents(s, dir)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(words).as("n_words"),
            sum(subwords).as("n_subwords"))
          .withColumn("fertility",
            when(col("n_words") > 0, graft.Num.dround(
              col("n_subwords").cast("double") / col("n_words").cast("double"), 6)))
          .orderBy("lang")
      },
      Some(s"""
        WITH wrd AS (
          SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents),
        pc AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
                 CAST(sum(${sqlHandedBpeCost("w")}) AS BIGINT) AS n_subwords
          FROM wrd GROUP BY 1),
        d AS (
          SELECT doc.lang, coalesce(pc.n_words, 0) AS n_words,
                 coalesce(pc.n_subwords, 0) AS n_subwords
          FROM documents doc LEFT JOIN pc ON pc.doc_id = doc.doc_id),
        agg AS (
          SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(n_words) AS BIGINT) AS n_words,
                 CAST(sum(n_subwords) AS BIGINT) AS n_subwords
          FROM d GROUP BY lang)
        SELECT lang, n_docs, n_words, n_subwords,
               CASE WHEN n_words > 0 THEN
                 floor(CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE) * 1e6 + 0.5) / 1e6
               END AS fertility
        FROM agg ORDER BY lang""")),

    // Unicode-script composition profile (§2 row 155): the language-
    // consistency audit — per-doc codepoint tallies for the five
    // majority scripts + digits + explicit whitespace, with the dominant
    // script. The ASCII corpus is planted with deterministic Cyrillic /
    // Han / Greek / Arabic suffixes (the normalize_nfc precedent) so
    // every class and the tie rule are live in the hash compare.
    Q("text_scripts",
      (s, dir) => {
        val planted = Tables.documents(s, dir).select(col("doc_id"),
          when(col("doc_id") % 7 === 1, concat(col("text"), lit(CyrSuffix)))
            .when(col("doc_id") % 7 === 2, concat(col("text"), lit(HanSuffix)))
            .when(col("doc_id") % 7 === 3, concat(col("text"), lit(GreekSuffix)))
            .when(col("doc_id") % 7 === 4, concat(col("text"), lit(ArabicSuffix)))
            .when(col("doc_id") % 7 === 5, concat(col("text"), lit(" 2024 and 42")))
            .otherwise(col("text")).as("text"))
        graft.text.Scripts.profile(planted, "doc_id", "text")
          .orderBy("doc_id")
      },
      Some(s"""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 7 = 1 THEN text || '$CyrSuffix'
                      WHEN doc_id % 7 = 2 THEN text || '$HanSuffix'
                      WHEN doc_id % 7 = 3 THEN text || '$GreekSuffix'
                      WHEN doc_id % 7 = 4 THEN text || '$ArabicSuffix'
                      WHEN doc_id % 7 = 5 THEN text || ' 2024 and 42'
                      ELSE text END AS text
          FROM documents),
        ${graft.text.Scripts.sqlProfile("planted", "doc_id", "text")}
        ORDER BY doc_id""")),

    // Vocabulary drift between snapshots (§2 row 160): token-level
    // release-over-release comparison — top-50 union terms with
    // Laplace-smoothed probabilities, log-ratios and PSI contributions;
    // snapshots are the corpus doc_id-parity halves (deterministic,
    // mirrored). The oracle replays counts, the union join, the exact
    // scalar totals, top-K tie order and the smoothed arithmetic.
    Q("text_vocab_drift",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.drift.VocabDrift.vocabDrift(
            d.where(col("doc_id") % 2 === 0),
            d.where(col("doc_id") % 2 === 1),
            "text", topK = 50, smooth = 1)
          .orderBy("term")
      },
      Some(s"""
        WITH old_snap AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
        new_snap AS (SELECT text FROM documents WHERE doc_id % 2 = 1),
        ${graft.drift.VocabDrift.sqlVocabDrift("old_snap", "new_snap", 50, 1)}
        ORDER BY term""")),

    // Rank-biased overlap of the snapshots' top-100 term rankings (r13 —
    // Webber, Moffat & Zobel 2010): the ranking-stability companion of
    // text_vocab_drift — PSI asks "did token mass move?", RBO asks "did
    // the top-k LIST churn?", top-weighted by the p=0.9 persistence.
    // The regrouped depth weights are driver-computed constants both
    // engines read as identical literals (no cross-engine pow).
    Q("text_vocab_rbo",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.drift.VocabDrift.rbo(
          d.where(col("doc_id") % 2 === 0),
          d.where(col("doc_id") % 2 === 1),
          "text", p = 0.9, depth = 100)
      },
      Some(s"""
        WITH old_snap AS (SELECT text FROM documents WHERE doc_id % 2 = 0),
        new_snap AS (SELECT text FROM documents WHERE doc_id % 2 = 1),
        ${graft.drift.VocabDrift.sqlRbo("old_snap", "new_snap", 0.9, 100)}"""))
  )

  /** Handed BPE merge table for the hash-green token-budget oracles: two
    * rules with DISJOINT single-char sides, chosen so greedy encode has a
    * closed form (see [[sqlHandedBpeCost]]) while still firing constantly
    * on the corpus vocabulary ("the", "hash", "merge", "order", ...). */
  private[queries] val handedBpe =
    graft.text.Bpe.Model(Vector(("t", "h"), ("e", "r")))

  /** DuckDB closed-form subword count of ONE lowered word under
    * [[handedBpe]]: |w| + 1 (chars + the `</w>` terminal) minus one per
    * merge. With a≠b a pair can't self-overlap and with disjoint char
    * sets the rules can't interact, so each rule's merge count is exactly
    * its substring-occurrence count — `replace()` arithmetic. */
  private[queries] def sqlHandedBpeCost(w: String): String =
    s"""(length($w) + 1
        - CAST((length($w) - length(replace($w, 'th', ''))) / 2 AS BIGINT)
        - CAST((length($w) - length(replace($w, 'er', ''))) / 2 AS BIGINT))"""

  /** Full DuckDB mirror of `FastText.score` under [[ftHandedWeights]] /
    * [[ftHandedBias]] over `documents` — a complete SELECT emitting
    * (doc_id, n_feats, activation, score), no trailing ORDER BY so it
    * nests as a derived table. Single SQL owner shared by text_ft_score
    * and pipeline_ft_config (the persisted + YAML route), so the config
    * path cannot drift from the direct operator. */
  private[queries] def ftScoreOracleBody: String = ftScoreOracleBody("documents")

  /** Same, parameterized over the scored relation (doc_id, text) — lets
    * callers score a derived frame (e.g. the gate-eval mixed fixture)
    * without duplicating the scoring SQL. */
  private[queries] def ftScoreOracleBody(rel: String): String = {
    val vals = ftHandedWeights
      .map { case (f, w) => s"('$f', $w)" }.mkString(", ")
    s"""
        WITH wt(feature, weight) AS (VALUES $vals),
        dl AS (
          SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS l
          FROM $rel),
        gr AS (
          SELECT doc_id, g FROM (
            SELECT doc_id,
                   unnest(${Q.sqlNgrams("l", 1)} || ${Q.sqlNgrams("l", 2)}) AS g
            FROM dl)
          WHERE length(g) > 0),
        pf AS (
          SELECT doc_id,
                 floor(coalesce(weight, 0.0) * 1e6 + 0.5) / 1e6 AS wr
          FROM gr LEFT JOIN wt ON gr.g = wt.feature),
        ag AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                 CAST(sum(CAST(wr AS DECIMAL(38,6))) AS DOUBLE) / count(*) AS m
          FROM pf GROUP BY 1),
        act AS (
          SELECT d.doc_id, coalesce(ag.n_feats, 0) AS n_feats,
                 floor(($ftHandedBias + ag.m) * 1e6 + 0.5) / 1e6 AS activation
          FROM $rel d LEFT JOIN ag ON d.doc_id = ag.doc_id)
        SELECT doc_id, n_feats, activation,
               floor((1.0 / (1.0 + exp(-activation))) * 1e6 + 0.5) / 1e6 AS score
        FROM act"""
  }

  /** Handed fastText weight table + bias (features from the corpus
    * vocabulary, both unigrams and bigrams, mixed signs). defs, not vals:
    * `all` reads them during its own initializer. */
  private[queries] def ftHandedWeights: Seq[(String, Double)] = Seq(
    ("join", 0.8), ("hash", 0.5), ("slow", -0.9), ("fast", 0.7),
    ("table value", 0.4), ("row scan", -0.6), ("the", 0.1),
    ("big vector", -0.3))
  private[queries] def ftHandedBias: Double = -0.1

  /** Gopher thresholds for the driver queries: the paper's values except
    * minWords (the synthetic docs are ~30 words, the paper's 50 would
    * zero rule 1's pass side) — 10 keeps both outcomes populated. */
  private[queries] def gopherCfg = GopherRules.Config(minWords = 10, minStopHits = 2)

  private def ruleNames = Seq("r1_words", "r2_word_len", "r3_symbols",
    "r4_bullets", "r5_ellipsis", "r6_alpha", "r7_stopwords")

  /** Deterministic rule-exercising corpus: base docs plus six rewrites. */
  private[queries] def gopherFixture(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val d = docs.select("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    def band(m: Int, off: Long, text: org.apache.spark.sql.Column) =
      d.filter(col("doc_id") % 7 === m)
        .select((col("doc_id") + off).as("doc_id"), text.as("text"))
    d.unionByName(band(0, 1000000L,
        concat_ws("\n", transform(slice(toks, 1, 8), t => concat(lit("- "), t)))))
      .unionByName(band(1, 2000000L,
        concat(concat_ws("... ", slice(toks, 1, 6)), lit("..."))))
      .unionByName(band(2, 3000000L, concat(col("text"), lit(" # ## ###"))))
      .unionByName(band(3, 4000000L, lit("7 42 13 999 0 8 512 64 3 77 21 5")))
      .unionByName(band(4, 5000000L, concat_ws(" ", slice(toks, 1, 3))))
      .unionByName(band(5, 6000000L,
        concat(col("text"), lit(" the list of items that have to be counted with care"))))
  }

  /** Gopher-audit CTE chain (no leading WITH) over an arbitrary relation
    * `rel(doc_id, text)` — the single DuckDB mirror of
    * `GopherRules.audit` under [[gopherCfg]] (rule thresholds inlined,
    * booleans as 0/1 ints, every fraction through the floor-dround),
    * ending in an `audit` CTE. Shared by the fixture queries below and
    * the curation-chain oracle so the rule formulas cannot drift.
    * `minStopHits` and `minWords` are the thresholds callers tune to the
    * corpus at hand (the curation chain uses minStopHits=1: the synthetic
    * corpus tops out at one Gopher stopword per doc, and 2 would gate
    * every document out; the quality panel raises minWords so the
    * word-count rule splits the raw corpus both ways). */
  private[queries] def gopherAuditCtesOver(rel: String,
                                           minStopHits: Int = 2,
                                           minWords: Int = 10): String = {
    val stops = GopherRules.stopwords
      .map(w => s"CASE WHEN list_contains(w, '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""sig AS (
          SELECT doc_id, text,
                 regexp_split_to_array(lower(trim(text)), '\\s+') AS w,
                 string_split(text, chr(10)) AS ln,
                 length(trim(text)) = 0 AS blank
          FROM $rel),
        nw AS (
          SELECT *, CASE WHEN blank THEN 0 ELSE len(w) END AS n_words,
                 greatest(CAST(CASE WHEN blank THEN 0 ELSE len(w) END AS DOUBLE), 1.0) AS nwd,
                 greatest(CAST(len(ln) AS DOUBLE), 1.0) AS nld
          FROM sig),
        m AS (
          SELECT doc_id, CAST(n_words AS INT) AS n_words,
            floor((CASE WHEN blank THEN 0.0
                   ELSE CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / nwd
                   END) * 1e6 + 0.5) / 1e6 AS mean_word_len,
            floor((CAST(len(regexp_extract_all(text, '#'))
                        + len(regexp_extract_all(text, '\\.\\.\\.'))
                        + len(regexp_extract_all(text, '…')) AS DOUBLE) / nwd)
                  * 1e6 + 0.5) / 1e6 AS symbol_ratio,
            floor((CAST(len(list_filter(ln, x -> regexp_matches(x, '^\\s*[-*•‣▪]'))) AS DOUBLE) / nld)
                  * 1e6 + 0.5) / 1e6 AS bullet_frac,
            floor((CAST(len(list_filter(ln, x -> regexp_matches(x, '(\\.\\.\\.|…)\\s*${"$"}'))) AS DOUBLE) / nld)
                  * 1e6 + 0.5) / 1e6 AS ellipsis_frac,
            floor((CAST(len(list_filter(w, t -> regexp_matches(t, '\\p{L}'))) AS DOUBLE) / nwd)
                  * 1e6 + 0.5) / 1e6 AS alpha_frac,
            CAST($stops AS INT) AS stop_hits
          FROM nw),
        audit AS (
          SELECT *,
            CAST(n_words >= $minWords AND n_words <= 100000 AS INT) AS r1_words,
            CAST(mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS INT) AS r2_word_len,
            CAST(symbol_ratio <= 0.1 AS INT) AS r3_symbols,
            CAST(bullet_frac <= 0.9 AS INT) AS r4_bullets,
            CAST(ellipsis_frac <= 0.3 AS INT) AS r5_ellipsis,
            CAST(alpha_frac >= 0.8 AS INT) AS r6_alpha,
            CAST(stop_hits >= $minStopHits AS INT) AS r7_stopwords,
            CAST(n_words >= $minWords AND n_words <= 100000
                 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                 AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
                 AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8
                 AND stop_hits >= $minStopHits AS INT) AS keep
          FROM m)"""
  }

  /** DuckDB mirror of [[gopherFixture]] + the audit: the fixture's six
    * rule-exercising rewrites as `u`, then [[gopherAuditCtesOver]]. */
  private[queries] def gopherAuditSql: String =
    s"""WITH base AS (
          SELECT doc_id, text,
                 regexp_split_to_array(lower(trim(text)), '\\s+') AS l
          FROM documents),
        u AS (
          SELECT doc_id, text FROM base
          UNION ALL
          SELECT doc_id + 1000000,
                 array_to_string(list_transform(l[1:8], t -> '- ' || t), chr(10))
          FROM base WHERE doc_id % 7 = 0
          UNION ALL
          SELECT doc_id + 2000000, array_to_string(l[1:6], '... ') || '...'
          FROM base WHERE doc_id % 7 = 1
          UNION ALL
          SELECT doc_id + 3000000, text || ' # ## ###' FROM base WHERE doc_id % 7 = 2
          UNION ALL
          SELECT doc_id + 4000000, '7 42 13 999 0 8 512 64 3 77 21 5'
          FROM base WHERE doc_id % 7 = 3
          UNION ALL
          SELECT doc_id + 5000000, array_to_string(l[1:3], ' ')
          FROM base WHERE doc_id % 7 = 4
          UNION ALL
          SELECT doc_id + 6000000,
                 text || ' the list of items that have to be counted with care'
          FROM base WHERE doc_id % 7 = 5),
        ${gopherAuditCtesOver("u")}"""
}
