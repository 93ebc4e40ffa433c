package graft.queries

import graft.Tables
import graft.quality.{Anonymity, GateEval}
import graft.sim.{Pca, Quantize}
import graft.text.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Driver-checked queries for the gate-evaluation + governance family
  * (SURVEY §2.3 rows 125-131): classifier metrics over the engine's own
  * quality gates (ROC-AUC, PR sweep, calibration, inter-gate kappa),
  * k-anonymity/l-diversity release audits, encoding-artifact detection,
  * int8 embedding quantization, and the PCA spectrum.
  */
object EvalQueries {

  /** The labeled evaluation frame every gate-metric query shares: pos =
    * the corpus as-is, neg = a deterministic junk corruption of it (the
    * text_ft_train_score fixture — truncation + spam tokens) on
    * COLLISION-PROOF negative clone ids (−id−1: a fixed shift would
    * collide with real ids at a large enough corpus and silently corrupt
    * the labels). One Scala + one SQL owner for the construction, so
    * every gate is graded on the identical task. */
  private def mixedDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val neg = docs.select((negate(col("doc_id")) - 1L).as("doc_id"),
      concat(concat_ws(" ", slice(toks, 1, 6)),
        lit(" zz9 qq7 xx3 zz9 qq7 xx3 vv2 kk8 vv2")).as("text"))
    docs.withColumn("label", lit(1L))
      .unionByName(neg.withColumn("label", lit(0L)))
  }

  /** [[mixedDocs]] scored by the composite quality gate — a REAL gate
    * graded on a REAL separation task, every step ANSI-expressible. */
  private def mixedScored(s: SparkSession, dir: String): DataFrame =
    mixedDocs(s, dir).select(col("doc_id"), col("label"),
      TextAnalysis.qualityScore(col("text")).as("score"))

  /** DuckDB CTE chain (no leading WITH) building the mixed labeled+scored
    * frame, ending in `mg(score, n, npos)` — the distinct-score frame all
    * three metric oracles read. Single owner so the three metrics grade
    * the same gate on the same corpus. */
  private def mixedScoreCtes: String = s"""
        mixbase AS (SELECT doc_id, text FROM documents),
        mixneg AS (SELECT -doc_id - 1 AS doc_id,
          array_to_string((regexp_split_to_array(lower(trim(text)), '\\s+'))[1:6], ' ')
            || ' zz9 qq7 xx3 zz9 qq7 xx3 vv2 kk8 vv2' AS text FROM mixbase),
        mixed AS (SELECT doc_id, CAST(1 AS BIGINT) AS label, text FROM mixbase
                  UNION ALL SELECT doc_id, CAST(0 AS BIGINT), text FROM mixneg),
        mixq AS (SELECT doc_id, label, ${TextQueries.qualityColsSql} FROM mixed),
        msc AS (SELECT doc_id, label, ${TextQueries.qualityScoreSql} AS score FROM mixq),
        mg AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
                      CAST(sum(label) AS BIGINT) AS npos
               FROM msc GROUP BY 1)"""

  private val prThresholds: Seq[Double] = (0 to 10).map(_ / 10.0)

  /** DuckDB AUC tail over a relation of per-row (score, label) — the
    * rank-sum CTE chain shared by every gate's AUC oracle so the metric
    * formula has one SQL owner. Emits the final SELECT. */
  private def aucTailSql(rel: String): String = s"""
        mgx AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
                       CAST(sum(label) AS BIGINT) AS npos
                FROM $rel GROUP BY 1),
        mr AS (SELECT score, n, npos,
                 CAST(coalesce(sum(n) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS before
               FROM mgx),
        ma AS (SELECT CAST(sum(npos) AS BIGINT) AS p,
                 CAST(sum(n - npos) AS BIGINT) AS q,
                 sum(CAST(CAST(npos AS DOUBLE) *
                   (CAST(before AS DOUBLE) + (CAST(n AS DOUBLE) + 1.0) / 2.0)
                   AS DECIMAL(38,1))) AS rs
               FROM mr)
        SELECT p AS n_pos, q AS n_neg,
               CASE WHEN p > 0 AND q > 0 THEN
                 floor((CAST(rs - CAST((CAST(p AS HUGEINT) * (p + 1)) // 2 AS DECIMAL(38,1)) AS DOUBLE)
                   / (CAST(p AS DOUBLE) * CAST(q AS DOUBLE))) * 1e6 + 0.5) / 1e6
               END AS auc
        FROM ma"""

  /** Corpus + deterministic encoding corruption — every third doc gains a
    * different artifact class (Latin-1 mojibake / smart-quote mangle +
    * control char / replacement char). Shared by text_mojibake and the
    * YAML mojibake_filter stage so one oracle serves both. */
  private[queries] def mojibakeFixture(docs: DataFrame): DataFrame = {
    val base = docs.select("doc_id", "text")
    val cor = base.select((col("doc_id") + 2000000L).as("doc_id"),
      when(col("doc_id") % 3 === 0, replace(col("text"), lit("a"), lit("Ã¡")))
        .when(col("doc_id") % 3 === 1, concat(col("text"), lit(" itâ€™s here")))
        .otherwise(concat(lit("�"), col("text"))).as("text"))
    base.unionByName(cor)
  }

  /** DuckDB CTE chain (no leading WITH) building [[mojibakeFixture]] and
    * its audit counts, ending in `mjc(doc_id, n_mojibake, n_replacement,
    * n_control)` — the single SQL owner of the encoding-audit semantics. */
  private[queries] def mojibakeAuditCtes: String = s"""
        mjbase AS (SELECT doc_id, text FROM documents),
        mjcor AS (SELECT doc_id + 2000000 AS doc_id,
          CASE WHEN doc_id % 3 = 0 THEN replace(text, 'a', 'Ã¡')
               WHEN doc_id % 3 = 1 THEN text || ' itâ€™s here' || chr(7)
               ELSE chr(65533) || text END AS text FROM mjbase),
        mjall AS (SELECT doc_id, text FROM mjbase
                  UNION ALL SELECT doc_id, text FROM mjcor),
        mjc AS (SELECT doc_id,
                 CAST((length(text) - length(replace(text, 'Ã', ''))) / 1 AS BIGINT)
                 + CAST((length(text) - length(replace(text, 'â€', ''))) / 2 AS BIGINT)
                 + CAST((length(text) - length(replace(text, 'Â', ''))) / 1 AS BIGINT) AS n_mojibake,
                 CAST((length(text) - length(replace(text, chr(65533), ''))) / 1 AS BIGINT) AS n_replacement,
                 CAST(len(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT) AS n_control
                FROM mjall)"""

  def all: Seq[Q] = Seq(

    // ROC-AUC of the composite quality gate separating real docs from
    // junk corruptions — Mann-Whitney rank-sum with average-rank ties,
    // computed on the bounded distinct-score frame (SURVEY row 125).
    Q("quality_gate_auc",
      (s, dir) => GateEval.auc(mixedScored(s, dir), "score", "label"),
      Some(s"""
        WITH $mixedScoreCtes,
        ${aucTailSql("msc")}""")),

    // The SAME evaluation harness graded on a SECOND real gate (row 125):
    // ROC-AUC of the handed fastText classifier on the identical
    // real-vs-junk task — cross-gate comparability is the point of a
    // shared metric. Null-score (no-feature) docs are excluded on both
    // sides (no evidence is not a ranking).
    Q("quality_gate_auc_ft",
      (s, dir) => {
        val sp = s; import sp.implicits._
        val mixed = mixedDocs(s, dir)
        val scored = graft.text.FastText.score(mixed, "doc_id", "text",
            TextQueries.ftHandedWeights.toDF("feature", "weight"),
            bias = TextQueries.ftHandedBias)
          .join(mixed.select("doc_id", "label"), "doc_id")
          .filter(col("score").isNotNull)
        GateEval.auc(scored, "score", "label")
      },
      Some(s"""
        WITH $mixedScoreCtes,
        fts AS (SELECT doc_id, score
                FROM (${TextQueries.ftScoreOracleBody("mixed")})
                WHERE score IS NOT NULL),
        fl AS (SELECT f.score, m.label
               FROM fts f JOIN mixed m ON f.doc_id = m.doc_id),
        ${aucTailSql("fl")}""")),

    // Precision/recall/F1 sweep at fixed thresholds over the same gate
    // (row 125): the operating-point table behind picking a curation
    // cutoff. Empty prediction/label sides yield NULL metrics.
    Q("quality_gate_pr",
      (s, dir) => GateEval.prCurve(mixedScored(s, dir), "score", "label",
        prThresholds).orderBy("threshold"),
      Some(s"""
        WITH $mixedScoreCtes,
        mth AS (SELECT CAST(x AS DOUBLE) AS threshold
                FROM (VALUES ${prThresholds.map(t => s"($t)").mkString(",")}) v(x)),
        mc AS (SELECT threshold,
                 CAST(sum(CASE WHEN score >= threshold THEN npos ELSE 0 END) AS BIGINT) AS tp,
                 CAST(sum(CASE WHEN score >= threshold THEN n - npos ELSE 0 END) AS BIGINT) AS fp,
                 CAST(sum(CASE WHEN score < threshold THEN npos ELSE 0 END) AS BIGINT) AS fn,
                 CAST(sum(CASE WHEN score < threshold THEN n - npos ELSE 0 END) AS BIGINT) AS tn
               FROM mg CROSS JOIN mth GROUP BY 1),
        md AS (SELECT threshold, tp, fp, fn, tn,
                 CASE WHEN tp + fp > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS pr,
                 CASE WHEN tp + fn > 0 THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS rc
               FROM mc)
        SELECT threshold, tp, fp, fn, tn,
               CASE WHEN tp + fp > 0 THEN floor(pr * 1e6 + 0.5) / 1e6 END AS "precision",
               CASE WHEN tp + fn > 0 THEN floor(rc * 1e6 + 0.5) / 1e6 END AS recall,
               CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tp > 0
                    THEN floor(2.0 * pr * rc / (pr + rc) * 1e6 + 0.5) / 1e6
                    WHEN tp + fp > 0 AND tp + fn > 0 THEN 0.0 END AS f1
        FROM md ORDER BY threshold""")),

    // Calibration (reliability) table of the same gate (row 125): per
    // fixed-width score decile, mean score vs realized positive rate.
    Q("quality_gate_calibration",
      (s, dir) => GateEval.calibration(mixedScored(s, dir), "score", "label",
        bins = 10).orderBy("bin"),
      Some(s"""
        WITH $mixedScoreCtes
        SELECT bin, floor(CAST(bin AS DOUBLE) / 10 * 1e4 + 0.5) / 1e4 AS bin_lo,
               n, n_pos,
               floor(CAST(ssum AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_score,
               floor(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) / 1e6 AS pos_rate
        FROM (SELECT least(CAST(floor(score * 10) AS BIGINT), 9) AS bin,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(CASE WHEN label > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
                     sum(CAST(score AS DECIMAL(38,4))) AS ssum
              FROM msc GROUP BY 1)
        ORDER BY bin""")),

    // Cumulative gains / lift curve of the same gate (row 125): for every
    // distinct score, descending — population depth, captured-positive
    // gain, lift = gain/depth. The "read the top X% by this gate" table a
    // curation budget is set from; computed on the bounded distinct-score
    // frame (the AUC discipline — no corpus-wide row sort, no ntile
    // tie-splitting).
    Q("quality_gate_gains",
      (s, dir) => GateEval.gains(mixedScored(s, dir), "score", "label")
        .orderBy(col("score").desc),
      Some(s"""
        WITH $mixedScoreCtes
        SELECT score, n, npos AS n_pos,
               CAST(cum_n AS BIGINT) AS cum_n, CAST(cum_pos AS BIGINT) AS cum_pos,
               floor((CAST(cum_n AS DOUBLE) / CAST(tot_n AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS depth,
               CASE WHEN tot_pos > 0 THEN
                 floor((CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE)) * 1e6 + 0.5) / 1e6 END AS gain,
               CASE WHEN tot_pos > 0 THEN
                 floor(((CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE))
                   / (CAST(cum_n AS DOUBLE) / CAST(tot_n AS DOUBLE))) * 1e6 + 0.5) / 1e6 END AS lift
        FROM (SELECT score, n, npos,
                sum(n) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
                sum(npos) OVER (ORDER BY score DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos,
                sum(n) OVER () AS tot_n,
                sum(npos) OVER () AS tot_pos
              FROM mg)
        ORDER BY score DESC""")),

    // Cohen's kappa between the language-ID gate's 'en' verdict and the
    // corpus metadata label (row 126) — chance-corrected agreement, the
    // standard way to grade a classifier against noisy reference labels.
    Q("quality_gate_agreement",
      (s, dir) => {
        val verdicts = Tables.documents(s, dir).select(
          (TextAnalysis.languageId(col("text")) === "en").as("pred_en"),
          (col("lang") === "en").as("meta_en"))
        GateEval.kappa(verdicts, "pred_en", "meta_en")
      },
      Some(s"""
        WITH lp AS (
          SELECT (${TextQueries.langCaseSql}) = 'en' AS pred_en,
                 lang = 'en' AS meta_en
          FROM (SELECT doc_id, lang, ${TextQueries.langScoresSql} FROM documents)),
        kc AS (SELECT
                 CAST(sum(CASE WHEN pred_en AND meta_en THEN 1 ELSE 0 END) AS BIGINT) AS both_pass,
                 CAST(sum(CASE WHEN pred_en AND NOT meta_en THEN 1 ELSE 0 END) AS BIGINT) AS a_only,
                 CAST(sum(CASE WHEN NOT pred_en AND meta_en THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
                 CAST(sum(CASE WHEN NOT pred_en AND NOT meta_en THEN 1 ELSE 0 END) AS BIGINT) AS both_fail
               FROM lp),
        kd AS (SELECT *,
                 CAST(both_pass + both_fail AS DOUBLE)
                   / CAST(both_pass + a_only + b_only + both_fail AS DOUBLE) AS po,
                 CAST((both_pass + a_only) * (both_pass + b_only)
                      + (both_fail + b_only) * (both_fail + a_only) AS DOUBLE)
                   / (CAST(both_pass + a_only + b_only + both_fail AS DOUBLE)
                      * CAST(both_pass + a_only + b_only + both_fail AS DOUBLE)) AS pe
               FROM kc)
        SELECT both_pass, a_only, b_only, both_fail,
               floor(po * 1e6 + 0.5) / 1e6 AS p_o,
               floor(pe * 1e6 + 0.5) / 1e6 AS p_e,
               CASE WHEN 1.0 - pe <> 0.0
                    THEN floor((po - pe) / (1.0 - pe) * 1e6 + 0.5) / 1e6 END AS kappa
        FROM kd""")),

    // k-anonymity / l-diversity per-equivalence-class audit over the
    // customer release (row 127): QI = (nation, market segment),
    // sensitive attribute = the in-debt flag.
    Q("pii_k_anonymity",
      (s, dir) => Anonymity.audit(
        Tables.customer(s, dir).withColumn("in_debt", col("c_acctbal") < 0),
        Seq("c_nationkey", "c_mktsegment"), "in_debt", k = 5, l = 2)
        .orderBy("c_nationkey", "c_mktsegment"),
      Some(s"""
        SELECT c_nationkey, c_mktsegment,
               CAST(count(*) AS BIGINT) AS class_size,
               CAST(count(DISTINCT in_debt) AS BIGINT) AS n_sensitive,
               count(*) < 5 AS k_violation,
               count(DISTINCT in_debt) < 2 AS l_violation
        FROM (SELECT c_nationkey, c_mktsegment, c_acctbal < 0 AS in_debt
              FROM customer)
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // The release-level verdict (row 127): achieved k and l, violating
    // class/row counts, and the at-risk row fraction — one row.
    Q("pii_k_anonymity_summary",
      (s, dir) => Anonymity.summary(
        Tables.customer(s, dir).withColumn("in_debt", col("c_acctbal") < 0),
        Seq("c_nationkey", "c_mktsegment"), "in_debt", k = 5, l = 2),
      Some(s"""
        WITH cls AS (
          SELECT CAST(count(*) AS BIGINT) AS class_size,
                 CAST(count(DISTINCT in_debt) AS BIGINT) AS n_sensitive
          FROM (SELECT c_nationkey, c_mktsegment, c_acctbal < 0 AS in_debt
                FROM customer)
          GROUP BY c_nationkey, c_mktsegment),
        agg AS (SELECT
                 CAST(sum(class_size) AS BIGINT) AS n_rows,
                 CAST(count(*) AS BIGINT) AS n_classes,
                 CAST(min(class_size) AS BIGINT) AS k_achieved,
                 CAST(min(n_sensitive) AS BIGINT) AS l_achieved,
                 CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS k_violating_classes,
                 CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT) AS k_violating_rows,
                 CAST(sum(CASE WHEN n_sensitive < 2 THEN 1 ELSE 0 END) AS BIGINT) AS l_violating_classes
               FROM cls)
        SELECT *, floor(CAST(k_violating_rows AS DOUBLE)
                 / CAST(n_rows AS DOUBLE) * 1e6 + 0.5) / 1e6 AS at_risk_frac
        FROM agg""")),

    // Encoding-artifact audit (row 128): mojibake markers, replacement
    // chars, stray control chars -- over the corpus plus a deterministic
    // corruption fixture (the gopherFixture pattern: the synthetic corpus
    // is clean, so the rules must be made to fire both ways).
    Q("text_mojibake",
      (s, dir) => TextAnalysis.encodingAudit(
        mojibakeFixture(Tables.documents(s, dir)), "doc_id", "text")
        .orderBy("doc_id"),
      Some(s"""
        WITH $mojibakeAuditCtes
        SELECT doc_id, n_mojibake, n_replacement, n_control,
               n_mojibake + n_replacement + n_control = 0 AS is_clean
        FROM mjc ORDER BY doc_id""")),

    // Int8 scalar-quantization audit over the embedding corpus (row 129):
    // per-vector code book + reconstruction error — the SQ8-vs-PQ
    // decision table.
    Q("embedding_quantize",
      (s, dir) => Quantize.int8Audit(Tables.embeddings(s, dir),
        "vec_id", "embedding").orderBy("vec_id"),
      Some("""
        WITH qx AS (SELECT vec_id, CAST(u.x AS DOUBLE) AS x
                    FROM embeddings, unnest(embedding) AS u(x)),
        qs AS (SELECT vec_id, min(x) AS mn, max(x) AS mx,
                      CAST(count(*) AS BIGINT) AS nd
               FROM qx GROUP BY 1),
        qp AS (SELECT qx.vec_id, x, mn, nd,
                 CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END AS scale
               FROM qx JOIN qs ON qx.vec_id = qs.vec_id),
        qe AS (SELECT vec_id, mn, nd, scale,
                 x - (mn + least(255.0, greatest(0.0, floor((x - mn) / scale + 0.5))) * scale) AS e
               FROM qp)
        SELECT vec_id, nd AS n_dims, mn AS vmin, scale,
               floor(max(abs(e)) * 1e7 + 0.5) / 1e7 AS max_abs_err,
               floor((CAST(sum(CAST(floor(e * e * 1e12 + 0.5) / 1e12 AS DECIMAL(38,12)))
                 AS DOUBLE) / CAST(nd AS DOUBLE)) * 1e10 + 0.5) / 1e10 AS mse
        FROM qe GROUP BY vec_id, nd, mn, scale ORDER BY vec_id""")),

    // PCA spectrum of the embedding corpus (row 130): eigenvalues,
    // explained-variance ratios, heaviest-loading raw dimensions — the
    // effective-dimensionality / collapse audit. Rows-only: an
    // eigendecomposition has no ANSI form; PcaSpec pins the algebra
    // (orthonormality, Av=λv, trace, a closed-form 2-D fixture).
    Q("embedding_pca",
      (s, dir) => Pca.spectrum(Tables.embeddings(s, dir), "embedding")
        .orderBy("component"),
      None),

    // Corpus health scorecard (row 136): the reference's weighted data
    // health score (m00_utils/scoring.py — completeness/validity/
    // uniqueness weights) lifted to corpus curation: encoding hygiene,
    // gate quality, and duplication mass fold into one 0-100 score, with
    // the language-entropy diversity signal alongside. Three bounded
    // aggregates (full-pass stats, fingerprint cluster mass, lang
    // distribution) cross-joined as 1-row/dimension-sized broadcasts.
    Q("corpus_health",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val nD = count(lit(1)).cast(DoubleType)
        val base = docs.agg(
          count(lit(1)).as("n_docs"),
          graft.Num.dround(
            sum(when(TextAnalysis.isCleanText(col("text")), 1L).otherwise(0L))
              .cast(DoubleType) / nD, 6).as("clean_frac"),
          graft.Num.dround(
            sum(TextAnalysis.qualityScore(col("text")).cast(DecimalType(38, 4)))
              .cast(DoubleType) / nD, 6).as("mean_quality"),
          graft.Num.dround(
            sum(TextAnalysis.tokenCount(col("text")).cast("long"))
              .cast(DoubleType) / nD, 6).as("mean_tokens"))
        val dup = docs
          .groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
          .agg(count(lit(1)).as("sz"))
          .agg(graft.Num.dround(
            sum(col("sz") - 1L).cast(DoubleType) /
              sum(col("sz")).cast(DoubleType), 6).as("dup_frac"))
        val langCounts = docs.groupBy("lang").agg(count(lit(1)).as("c"))
        val tot = langCounts.agg(sum(col("c")).as("tot"))
        val p = col("c").cast(DoubleType) / col("tot").cast(DoubleType)
        val ent = langCounts.crossJoin(broadcast(tot))
          .select(graft.Num.dround(p * log(p), 9)
            .cast(DecimalType(30, 9)).as("term"))
          .agg(graft.Num.dround(
            sum(col("term")).cast(DoubleType) * lit(-1.0), 6)
            .as("lang_entropy"))
        base.crossJoin(broadcast(dup)).crossJoin(broadcast(ent))
          .withColumn("health_score", graft.Num.dround(
            lit(100.0) * (lit(0.35) * col("clean_frac")
              + lit(0.35) * col("mean_quality")
              + lit(0.30) * (lit(1.0) - col("dup_frac"))), 2))
      },
      Some(s"""
        WITH t AS (SELECT doc_id, lang, text,
                     ${TextQueries.sqlTokenCount("text")} AS ntok,
                     ${TextQueries.qualityColsSql}
                   FROM documents),
        t2 AS (SELECT doc_id, lang, ntok, ${TextQueries.qualityScoreSql} AS q,
                 CASE WHEN
                   CAST((length(text) - length(replace(text, 'Ã', ''))) / 1 AS BIGINT)
                   + CAST((length(text) - length(replace(text, 'â€', ''))) / 2 AS BIGINT)
                   + CAST((length(text) - length(replace(text, 'Â', ''))) / 1 AS BIGINT)
                   + CAST((length(text) - length(replace(text, chr(65533), ''))) / 1 AS BIGINT)
                   + CAST(len(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT)
                   = 0 THEN 1 ELSE 0 END AS clean
               FROM t),
        base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                  floor(CAST(sum(clean) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS clean_frac,
                  floor(CAST(sum(CAST(q AS DECIMAL(38,4))) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_quality,
                  floor(CAST(sum(ntok) AS DOUBLE) / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_tokens
                 FROM t2),
        cl AS (SELECT md5(${TextQueries.sqlNormText("text")}) AS fp,
                 CAST(count(*) AS BIGINT) AS sz
               FROM documents GROUP BY 1),
        dup AS (SELECT floor(CAST(sum(sz - 1) AS DOUBLE) / CAST(sum(sz) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS dup_frac
                FROM cl),
        lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1),
        ltot AS (SELECT CAST(sum(c) AS BIGINT) AS tot FROM lc),
        terms AS (SELECT CAST(floor((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
                    * ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE)) * 1e9 + 0.5) / 1e9
                    AS DECIMAL(30,9)) AS term
                  FROM lc, ltot),
        ent AS (SELECT floor(CAST(sum(term) AS DOUBLE) * -1.0 * 1e6 + 0.5) / 1e6 AS lang_entropy
                FROM terms)
        SELECT n_docs, clean_frac, mean_quality, mean_tokens, dup_frac, lang_entropy,
               floor((100.0 * (0.35 * clean_frac + 0.35 * mean_quality
                 + 0.30 * (1.0 - dup_frac))) * 1e2 + 0.5) / 1e2 AS health_score
        FROM base, dup, ent""")),

    // Per-source corpus composition (row 131): the RefinedWeb-style
    // per-domain table (docs, languages, tokens, chars, mean gate score)
    // a mixture plan starts from.
    Q("corpus_source_stats",
      (s, dir) => Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          count_distinct(col("lang")).as("n_langs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("n_tokens"),
          sum(col("n_chars")).as("sum_chars"),
          graft.Num.dround(
            sum(TextAnalysis.qualityScore(col("text")).cast(DecimalType(38, 4)))
              .cast(DoubleType) / count(lit(1)).cast(DoubleType), 6)
            .as("mean_quality"))
        .orderBy("source"),
      Some(s"""
        WITH t AS (SELECT source, lang, n_chars,
                     ${TextQueries.sqlTokenCount("text")} AS ntok,
                     ${TextQueries.qualityColsSql}
                   FROM documents),
        s2 AS (SELECT source, lang, n_chars, ntok,
                 ${TextQueries.qualityScoreSql} AS q FROM t)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(ntok) AS BIGINT) AS n_tokens,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               floor(CAST(sum(CAST(q AS DECIMAL(38,4))) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS mean_quality
        FROM s2 GROUP BY source ORDER BY source""")),

    // Flesch reading-ease audit (row 137): the classic readability
    // formula over portable proxies — words = non-empty whitespace
    // tokens, sentences = terminal-punctuation runs (floored at 1),
    // syllables = vowel-group runs. The educational-value/readability
    // gate family of modern curation stacks; pure codegen'd projection.
    Q("text_readability",
      (s, dir) => {
        val toks = TextAnalysis.tokens(col("text"))
        val words = size(filter(toks, w => length(w) > 0)).cast("long")
        val sents = greatest(lit(1L),
          regexp_count(col("text"), lit("[.!?]+")).cast("long"))
        val syl = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long")
        Tables.documents(s, dir).select(col("doc_id"),
            words.as("n_words"), sents.as("n_sentences"),
            syl.as("n_syllable_groups"))
          .withColumn("flesch",
            when(col("n_words") > 0, graft.Num.dround(
              lit(206.835)
                - lit(1.015) * (col("n_words").cast(DoubleType)
                  / col("n_sentences").cast(DoubleType))
                - lit(84.6) * (col("n_syllable_groups").cast(DoubleType)
                  / col("n_words").cast(DoubleType)), 4)))
          .orderBy("doc_id")
      },
      Some(s"""
        WITH rd AS (
          SELECT doc_id,
            CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
              x -> length(x) > 0)) AS BIGINT) AS n_words,
            CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
            CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllable_groups
          FROM documents)
        SELECT doc_id, n_words, n_sentences, n_syllable_groups,
               CASE WHEN n_words > 0 THEN
                 floor((206.835
                   - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                   - 84.6 * (CAST(n_syllable_groups AS DOUBLE) / CAST(n_words AS DOUBLE)))
                   * 1e4 + 0.5) / 1e4
               END AS flesch
        FROM rd ORDER BY doc_id""")),

    // Top-k PCA projection of the corpus (row 130's `project` lane):
    // per-vector scores along the fitted spectrum — the dimensionality-
    // reduction output itself, emitted as SCALAR pc_0..pc_3 columns (a
    // top-level array column defeats the gate's canonicalizer — the r10
    // red row). Rows-only like embedding_pca (driver eigensolve); PcaSpec
    // pins projection variance ≡ eigenvalue.
    Q("embedding_pca_project",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val m = Pca.fit(e, "embedding")
        Pca.projectFlat(e, "vec_id", "embedding", m, k = 4).orderBy("vec_id")
      },
      None),

    // The projection machinery HASH-GREEN (the Pq/BPE handed-fixture
    // precedent): project through a HANDED orthonormal loadings matrix —
    // 4 Walsh rows with entries ±0.125 (exactly representable; ‖w‖ = 1 by
    // construction) and a zero mean — so every per-dim product is EXACT
    // (float × 2⁻³) and the centered-dot-product pipeline has a closed
    // DuckDB form (list_dot_product, the dedup_embedding-proven
    // bit-identical accumulation order). A hash match proves projectFlat's
    // zip_with/aggregate fold ≡ the semantic dot product end to end; only
    // the eigensolve itself stays rows-only (embedding_pca).
    Q("embedding_pca_project_handed",
      (s, dir) => Pca.projectFlat(Tables.embeddings(s, dir),
          "vec_id", "embedding", walshModel, k = 4)
        .orderBy("vec_id"),
      Some {
        val comps = walshLoadings.zipWithIndex.map { case (w, i) =>
          val arr = w.mkString("[", ", ", "]")
          s"${Q.sqlDround(s"list_dot_product(CAST(embedding AS DOUBLE[]), $arr)", 6)} AS pc_$i"
        }.mkString(",\n               ")
        s"""
        SELECT vec_id,
               $comps
        FROM embeddings ORDER BY vec_id"""
      })
    ,

    // Whitened projection HASH-GREEN under the same handed fixture, with
    // HANDED eigenvalues 4/1/0.25/0.0625 (powers of 4, so every √λ is an
    // exact power of 2 and the per-component division is an exact float
    // scale) — proving the unit-variance rescale path end to end; the
    // fitted-eigenvalue lane stays covered by PcaSpec's variance pin.
    Q("embedding_whiten_handed",
      (s, dir) => Pca.whitenFlat(Tables.embeddings(s, dir),
          "vec_id", "embedding", walshWhitenModel, k = 4)
        .orderBy("vec_id"),
      Some {
        val scales = Seq(2.0, 1.0, 0.5, 0.25)
        val comps = walshLoadings.zipWithIndex.map { case (w, i) =>
          val arr = w.mkString("[", ", ", "]")
          s"${Q.sqlDround(s"list_dot_product(CAST(embedding AS DOUBLE[]), $arr) / ${scales(i)}", 6)} AS pc_$i"
        }.mkString(",\n               ")
        s"""
        SELECT vec_id,
               $comps
        FROM embeddings ORDER BY vec_id"""
      }),

    // Split-conformal prediction intervals (§2 row 161): per event_type,
    // q̂ at the finite-sample rank ceil((n_calib+1)(1−α)) over
    // calibration residuals, held-out coverage — the distribution-free
    // per-prediction uncertainty next to the bootstrap's per-mean CIs.
    // The oracle replays the Knuth split, the exact-decimal model mean,
    // the rank selection and the coverage count.
    Q("gate_conformal",
      (s, dir) => graft.quality.Conformal.intervals(
          Tables.events(s, dir), "event_id", "value", Seq("event_type"),
          alpha = 0.1, calibFraction = 0.5, seed = 0L)
        .orderBy("event_type"),
      Some {
        val oneMinusAlpha = 1.0 - 0.1 // the SAME Scala double the engine uses
        val bucket = graft.ops.Sampling.sqlBucketFolded("k", 0L,
          graft.quality.Conformal.SplitPrime)
        s"""
        WITH pts AS (
          SELECT event_type, event_id AS k, CAST(value AS DECIMAL(18,4)) AS v,
                 ($bucket < 500000) AS calib
          FROM events WHERE value IS NOT NULL),
        model AS (
          SELECT event_type, count(*) AS n_calib,
                 ${Q.sqlDround("CAST(round(sum(v), 2) AS DOUBLE) / count(*)", 4)}
                   AS model_mean
          FROM pts WHERE calib GROUP BY 1),
        ranked AS (
          SELECT p.event_type, m.n_calib,
                 abs(CAST(p.v AS DOUBLE) - m.model_mean) AS res,
                 row_number() OVER (PARTITION BY p.event_type
                   ORDER BY abs(CAST(p.v AS DOUBLE) - m.model_mean), p.k) AS rn
          FROM pts p JOIN model m USING (event_type) WHERE p.calib),
        qh AS (
          SELECT event_type, res AS qraw FROM ranked
          WHERE rn = least(CAST(ceil(CAST($oneMinusAlpha AS DOUBLE) * (n_calib + 1)) AS BIGINT),
                           n_calib)),
        cov AS (
          SELECT p.event_type, count(*) AS n_eval,
                 ${Q.sqlDround(s"""CAST(sum(CASE WHEN
                     abs(CAST(p.v AS DOUBLE) - m.model_mean) <= q.qraw
                     THEN 1 ELSE 0 END) AS DOUBLE) / count(*)""", 4)}
                   AS coverage,
                 max(q.qraw) AS qraw
          FROM pts p JOIN model m USING (event_type) JOIN qh q USING (event_type)
          WHERE NOT p.calib GROUP BY 1),
        fin AS (SELECT m.event_type, m.n_calib, c.n_eval,
                  ${Q.sqlDround("m.model_mean", 4)} AS model_mean,
                  ${Q.sqlDround("c.qraw", 4)} AS qhat, c.coverage
                FROM model m JOIN cov c USING (event_type))
        SELECT event_type, n_calib, n_eval, model_mean, qhat,
               ${Q.sqlDround("qhat * 2", 4)} AS width, coverage
        FROM fin ORDER BY event_type"""
      }),

    // Two-proportion A/B readout with Wilson intervals (§2 row 165):
    // per event_type, arm = event_id parity, success = value > 40 —
    // exact counts, pooled z, per-arm Wilson bounds, every IEEE chain
    // replayed by the oracle.
    Q("ab_proportions",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .where(col("value").isNotNull)
          .withColumn("arm",
            when(col("event_id") % 2 === 0, "a").otherwise("b"))
          .withColumn("flag", col("value") > 40)
        graft.quality.AbTest.proportions(e, "arm", "flag", Seq("event_type"))
          .orderBy("event_type")
      },
      Some {
        import graft.quality.AbTest.sqlWilson
        val z = 1.96
        s"""
        WITH base AS (
          SELECT event_type,
                 CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
                 (value > 40) AS flag
          FROM events WHERE value IS NOT NULL),
        agg AS (
          SELECT event_type,
                 CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(sum(CASE WHEN arm = 'a' AND flag THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
                 CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                 CAST(sum(CASE WHEN arm = 'b' AND flag THEN 1 ELSE 0 END) AS BIGINT) AS x_b
          FROM base GROUP BY 1),
        d AS (
          SELECT *,
                 CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS pa,
                 CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS pb,
                 CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE) AS pp,
                 CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb
          FROM agg)
        SELECT event_type, n_a, x_a, n_b, x_b,
               CASE WHEN n_a > 0 THEN ${Q.sqlDround("pa", 6)} END AS p_a,
               CASE WHEN n_b > 0 THEN ${Q.sqlDround("pb", 6)} END AS p_b,
               CASE WHEN n_a > 0 AND n_b > 0
                 THEN ${Q.sqlDround("pb - pa", 6)} END AS diff,
               CASE WHEN n_a > 0 AND n_b > 0 AND
                      sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)) > 0
                 THEN ${Q.sqlDround(
                   "(pb - pa) / sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb))", 4)}
               END AS z_stat,
               CASE WHEN n_a > 0 THEN ${Q.sqlDround(sqlWilson("pa", "na", z, lower = true), 6)} END AS a_lo,
               CASE WHEN n_a > 0 THEN ${Q.sqlDround(sqlWilson("pa", "na", z, lower = false), 6)} END AS a_hi,
               CASE WHEN n_b > 0 THEN ${Q.sqlDround(sqlWilson("pb", "nb", z, lower = true), 6)} END AS b_lo,
               CASE WHEN n_b > 0 THEN ${Q.sqlDround(sqlWilson("pb", "nb", z, lower = false), 6)} END AS b_hi
        FROM d ORDER BY event_type"""
      }),

    // Mann-Whitney U rank-sum readout (§2 row 172 — Mann & Whitney
    // 1947): the nonparametric arm comparison, computed from the
    // bounded value histogram (midranks in exact halves, tie-corrected
    // sigma) — no global sort, no normality assumption. The oracle
    // replays the histogram, doubled ranks, U statistics, and the z
    // chain verbatim. HASH-GREEN.
    Q("ab_mannwhitney",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .where(col("value").isNotNull)
          .withColumn("arm",
            when(col("event_id") % 2 === 0, "a").otherwise("b"))
        graft.quality.AbTest.mannWhitney(e, "arm", "value", Seq("event_type"))
          .orderBy("event_type")
      },
      Some(s"""
        WITH mwbase AS (
          SELECT event_type,
                 CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm,
                 CAST(value AS DECIMAL(18,4)) AS v
          FROM events WHERE value IS NOT NULL),
        ${graft.quality.AbTest.sqlMannWhitney("mwbase", "event_type")}
        ORDER BY event_type""")),

    // CUPED variance-reduced A/B readout (Deng et al., WSDM 2013 — §2
    // row 166): per-user pre-period covariate x and post-period metric
    // y split at 2024-01-15T00Z, θ = S_xy/S_xx on exact-decimal
    // centered moments, adjusted arm means and the variance-reduction
    // fraction — every chain (user means, moments, θ, adjusted means,
    // variances) replayed by the oracle. HASH-GREEN.
    Q("ab_cuped",
      (s, dir) => graft.quality.AbTest.cuped(
          Tables.events(s, dir), "user_id", "ts", "value",
          cutoverUs = 1705276800000000L)
        .orderBy("arm"),
      Some {
        val cut = 1705276800000000L
        def d6(e: String) = Q.sqlDround(e, 6)
        def d8(e: String) = Q.sqlDround(e, 8)
        s"""
        WITH ce AS (
          SELECT CAST(user_id AS BIGINT) AS u, epoch_us(ts) AS us,
                 CAST(value AS DECIMAL(18,4)) AS v
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
        cper0 AS (
          SELECT u,
                 count(*) FILTER (us < $cut) AS n_pre,
                 ${d6(s"CAST(sum(v) FILTER (us < $cut) AS DOUBLE) / count(*) FILTER (us < $cut)")} AS x,
                 count(*) FILTER (us >= $cut) AS n_post,
                 ${d6(s"CAST(sum(v) FILTER (us >= $cut) AS DOUBLE) / count(*) FILTER (us >= $cut)")} AS y
          FROM ce GROUP BY u),
        cper AS (
          SELECT u, CASE WHEN u % 2 = 0 THEN 'a' ELSE 'b' END AS arm, x, y
          FROM cper0 WHERE n_pre > 0 AND n_post > 0),
        cg AS (
          SELECT CAST(count(*) AS BIGINT) AS n_users,
                 ${d6("CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / count(*)")} AS xbar,
                 ${d6("CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / count(*)")} AS ybar
          FROM cper),
        cwg AS (SELECT cper.*, cg.n_users, cg.xbar, cg.ybar FROM cper, cg),
        cmom AS (
          SELECT
            CAST(round(sum(CAST(${d8("(x - xbar) * (y - ybar)")} AS DECIMAL(38,8))), 2) AS DOUBLE) AS sxy,
            CAST(round(sum(CAST(${d8("(x - xbar) * (x - xbar)")} AS DECIMAL(38,8))), 2) AS DOUBLE) AS sxx,
            CAST(round(sum(CAST(${d8("(y - ybar) * (y - ybar)")} AS DECIMAL(38,8))), 2) AS DOUBLE) AS syy
          FROM cwg),
        cadj AS (
          SELECT cwg.*, sxy, sxx,
                 CASE WHEN sxx > 0 THEN ${d6("sxy / sxx")} END AS theta
          FROM cwg, cmom),
        cadj2 AS (
          SELECT *, CASE WHEN theta IS NOT NULL
                      THEN y - theta * (x - xbar) ELSE y END AS y_adj
          FROM cadj),
        carm AS (
          SELECT arm, CAST(count(*) AS BIGINT) AS n,
                 ${d6("CAST(sum(CAST(y AS DECIMAL(38,6))) AS DOUBLE) / count(*)")} AS mean_y,
                 ${d6(s"CAST(sum(CAST(${d6("y_adj")} AS DECIMAL(38,6))) AS DOUBLE) / count(*)")} AS mean_y_adj
          FROM cadj2 GROUP BY arm),
        csadj AS (
          SELECT CAST(round(sum(CAST(${d8("(y_adj - ybar) * (y_adj - ybar)")} AS DECIMAL(38,8))), 2) AS DOUBLE) AS s_adj
          FROM cadj2)
        SELECT arm, n, mean_y, mean_y_adj, cg.n_users,
               CASE WHEN sxx > 0 THEN ${d6("sxy / sxx")} END AS theta,
               ${d6("syy / cg.n_users")} AS var_y,
               ${d6("s_adj / cg.n_users")} AS var_adj,
               CASE WHEN ${d6("syy / cg.n_users")} > 0
                 THEN ${d6(s"1.0 - (${d6("s_adj / cg.n_users")}) / (${d6("syy / cg.n_users")})")}
               END AS var_reduction
        FROM carm, cg, cmom, csadj
        ORDER BY arm"""
      })
  )

  /** Handed orthonormal loadings: the first 4 Walsh (Hadamard) functions
    * over 64 dims with entries ±0.125 = ±1/√64 — exactly representable
    * (2⁻³), mutually orthogonal sign patterns, unit norm. */
  private[queries] val walshLoadings: Seq[Array[Double]] = Seq(
    Array.tabulate(64)(_ => 0.125),
    Array.tabulate(64)(i => if (i < 32) 0.125 else -0.125),
    Array.tabulate(64)(i => if ((i / 16) % 2 == 0) 0.125 else -0.125),
    Array.tabulate(64)(i => if ((i / 8) % 2 == 0) 0.125 else -0.125))

  /** The handed loadings as a [[Pca.Model]] (zero mean; eigenvalues are
    * placeholders — projection never reads them). */
  private val walshModel: Pca.Model =
    Pca.Model(Array.fill(64)(0.0), Array.fill(4)(1.0), walshLoadings.toArray)

  /** The whitening fixture: same loadings, eigenvalues 4/1/0.25/0.0625 —
    * powers of 4, so each √λ (2/1/0.5/0.25) is an exact power of two and
    * the rescale divides exactly in both engines. */
  private val walshWhitenModel: Pca.Model =
    Pca.Model(Array.fill(64)(0.0), Array(4.0, 1.0, 0.25, 0.0625),
      walshLoadings.toArray)
}
