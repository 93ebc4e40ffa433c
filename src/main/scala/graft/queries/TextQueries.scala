package graft.queries

import graft.Tables
import graft.dedup.LlmDedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Driver-checked queries for SURVEY §2.3 rows 45 + 52-55 (text analysis
  * and exact dedup over the `documents` table). */
object TextQueries {

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  /** DuckDB: per-language stopword hit count over whitespace tokens. */
  private def hitsSql(words: Seq[String]): String =
    s"len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t IN ${inList(words)}))"

  val all: Seq[Q] = Seq(
    Q("text_tokens",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("bpe_tokens"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS bpe_tokens
        FROM documents ORDER BY doc_id""")),

    Q("text_langid",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextAnalysis.languageId(col("text")).as("lang_pred"))
        .orderBy("doc_id"),
      Some {
        val scores = TextAnalysis.stopwords
          .map { case (l, ws) => s"${hitsSql(ws)} AS s_$l" }.mkString(",\n  ")
        val langs = TextAnalysis.stopwords.map(_._1)
        val best = s"greatest(${langs.map("s_" + _).mkString(",")})"
        val chain = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
        s"""
        SELECT doc_id, lang,
               CASE WHEN $best <= 0 THEN 'unknown' $chain
                    ELSE 'unknown' END AS lang_pred
        FROM (SELECT doc_id, lang, $scores FROM documents)
        ORDER BY doc_id"""
      }),

    Q("text_quality",
      (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id"),
      Some {
        val en = inList(TextAnalysis.stopwords.toMap.apply("en"))
        s"""
        WITH t AS (
          SELECT doc_id,
                 CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS DOUBLE) AS n_tok,
                 CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE) AS punct,
                 greatest(CAST(length(text) AS DOUBLE), 1.0) AS chars,
                 CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x IN $en)) AS DOUBLE) AS stop_hits,
                 CAST(len(list_distinct(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS DOUBLE) AS n_distinct
          FROM documents)
        SELECT doc_id,
               floor((0.3 * least(1.0, n_tok / 50.0)
                   + 0.3 * (1.0 - least(1.0, punct / chars))
                   + 0.2 * least(1.0, stop_hits / greatest(n_tok, 1.0) * 5.0)
                   + 0.2 * (n_distinct / greatest(n_tok, 1.0))) * 1e4 + 0.5) / 1e4 AS quality
        FROM t ORDER BY doc_id"""
      }),

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
        SELECT min(doc_id) AS doc_id FROM n GROUP BY norm ORDER BY doc_id"""))
  )
}
