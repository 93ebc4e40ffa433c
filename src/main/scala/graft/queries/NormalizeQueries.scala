package graft.queries

import graft.Tables
import graft.normalize._
import org.apache.spark.sql.functions._

/** Driver-checked queries for SURVEY §2.1 rows 13-18 (normalization).
  * Typos / dirty strings are synthesized deterministically from the clean
  * testdata so the cleaning paths are actually exercised and the DuckDB
  * oracle can reproduce the same corruption.
  */
object NormalizeQueries {

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val segmentsExt = segments.map(_ + " DIVISION GROUP")

  val all: Seq[Q] = Seq(
    // rename + standardize_text in one config pass.
    Q("normalize_customer",
      (s, dir) => {
        val (out, _) = Normalizer(Tables.customer(s, dir), NormalizeConfig(
          renameColumns = Map("c_name" -> "customer_name"),
          standardizeTextColumns = Seq("customer_name", "c_mktsegment")))
        out.select("c_custkey", "customer_name", "c_mktsegment").orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, lower(trim(c_name)) AS customer_name,
               lower(trim(c_mktsegment)) AS c_mktsegment
        FROM customer ORDER BY c_custkey""")),

    // value mapping incl. a null sentinel (nulls synthesized on %13).
    Q("normalize_mapvalues",
      (s, dir) => {
        val o = Tables.orders(s, dir).withColumn("o_orderstatus",
          when(col("o_orderkey") % 13 === 0, lit(null))
            .otherwise(col("o_orderstatus")))
        val (out, _) = Normalizer(o, NormalizeConfig(valueMappings = Map(
          "o_orderstatus" -> Map(
            "F" -> "FINISHED", "O" -> "OPEN", "P" -> "PENDING",
            "null" -> "UNKNOWN"))))
        out.select("o_orderkey", "o_orderstatus").orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 13 = 0 THEN 'UNKNOWN'
                    WHEN o_orderstatus = 'F' THEN 'FINISHED'
                    WHEN o_orderstatus = 'O' THEN 'OPEN'
                    WHEN o_orderstatus = 'P' THEN 'PENDING'
                    ELSE o_orderstatus END AS o_orderstatus
        FROM orders ORDER BY o_orderkey""")),

    // fuzzy correction: corrupt every 7th segment label, then heal it
    // against the master list.
    Q("normalize_fuzzy",
      (s, dir) => {
        val c = Tables.customer(s, dir).withColumn("seg",
          when(col("c_custkey") % 7 === 0, concat(col("c_mktsegment"), lit("x")))
            .otherwise(col("c_mktsegment")))
        Normalizer.fuzzyCorrect(c, "seg", FuzzySpec(segments, cutoff = 80.0))
          .select("c_custkey", "seg").orderBy("c_custkey")
      },
      Some(s"""
        WITH corrupted AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 7 = 0 THEN c_mktsegment || 'x'
                      ELSE c_mktsegment END AS seg
          FROM customer),
        master AS (SELECT * FROM (VALUES ${segments.map(v => s"('$v')").mkString(",")}) m(_gf_master)),
        vals AS (
          SELECT DISTINCT seg FROM corrupted
          WHERE seg IS NOT NULL AND seg NOT IN (${segments.map(v => s"'$v'").mkString(",")})),
        scored AS (
          -- mirrors fuzzyCorrect: max(plain, token-sorted) similarity
          SELECT seg, _gf_master,
                 greatest(
                   100.0 * (1.0 - CAST(levenshtein(seg, _gf_master) AS DOUBLE) /
                     greatest(length(seg), length(_gf_master))),
                   100.0 * (1.0 - CAST(levenshtein(
                       array_to_string(list_sort(string_split_regex(trim(seg), '\\s+')), ' '),
                       array_to_string(list_sort(string_split_regex(trim(_gf_master), '\\s+')), ' ')) AS DOUBLE) /
                     greatest(
                       length(array_to_string(list_sort(string_split_regex(trim(seg), '\\s+')), ' ')),
                       length(array_to_string(list_sort(string_split_regex(trim(_gf_master), '\\s+')), ' '))))
                 ) AS score
          FROM vals CROSS JOIN master),
        best AS (
          SELECT seg, _gf_master FROM (
            SELECT seg, _gf_master, score,
                   row_number() OVER (PARTITION BY seg ORDER BY score DESC, _gf_master) AS rn
            FROM scored)
          WHERE rn = 1 AND score >= 80.0)
        SELECT c.c_custkey, coalesce(b._gf_master, c.seg) AS seg
        FROM corrupted c LEFT JOIN best b USING (seg)
        ORDER BY c.c_custkey""")),

    // WRatio substring tier: every segment label is a strict prefix of its
    // master entry — plain and token-sorted scores sit at ~40, only the
    // 0.9 × best-window partial ratio clears the cutoff.
    Q("normalize_fuzzy_partial",
      (s, dir) => {
        val c = Tables.customer(s, dir).withColumn("seg", col("c_mktsegment"))
        Normalizer.fuzzyCorrect(c, "seg",
            FuzzySpec(segmentsExt, cutoff = 85.0, partialRatio = true))
          .select("c_custkey", "seg").orderBy("c_custkey")
      },
      Some(s"""
        WITH src AS (SELECT c_custkey, c_mktsegment AS seg FROM customer),
        master AS (SELECT * FROM (VALUES ${segmentsExt.map(v => s"('$v')").mkString(",")}) m(_gf_master)),
        vals AS (
          SELECT DISTINCT seg FROM src
          WHERE seg IS NOT NULL AND seg NOT IN (${segmentsExt.map(v => s"'$v'").mkString(",")})),
        sides AS (
          SELECT seg, _gf_master,
                 CASE WHEN length(seg) <= length(_gf_master) THEN seg ELSE _gf_master END AS s,
                 CASE WHEN length(seg) <= length(_gf_master) THEN _gf_master ELSE seg END AS l
          FROM vals CROSS JOIN master),
        terms AS (
          SELECT seg, _gf_master,
                 100.0 * (1.0 - CAST(levenshtein(seg, _gf_master) AS DOUBLE) /
                   greatest(length(seg), length(_gf_master))) AS plain,
                 100.0 * (1.0 - CAST(levenshtein(
                     array_to_string(list_sort(string_split_regex(trim(seg), '\\s+')), ' '),
                     array_to_string(list_sort(string_split_regex(trim(_gf_master), '\\s+')), ' ')) AS DOUBLE) /
                   greatest(
                     length(array_to_string(list_sort(string_split_regex(trim(seg), '\\s+')), ' ')),
                     length(array_to_string(list_sort(string_split_regex(trim(_gf_master), '\\s+')), ' ')))) AS tsort,
                 CASE WHEN length(s) = 0 THEN 0.0
                      ELSE list_aggregate(list_transform(
                        generate_series(1, length(l) - length(s) + 1),
                        i -> 100.0 * (1.0 - CAST(levenshtein(s, substr(l, i, length(s))) AS DOUBLE) /
                          length(s))), 'max')
                 END AS partial
          FROM sides),
        scored AS (
          SELECT seg, _gf_master,
                 greatest(plain, tsort,
                   CASE WHEN greatest(length(seg), length(_gf_master)) >=
                             1.5 * least(length(seg), length(_gf_master))
                        THEN 0.9 * partial ELSE 0.0 END) AS score
          FROM terms),
        best AS (
          SELECT seg, _gf_master FROM (
            SELECT seg, _gf_master, score,
                   row_number() OVER (PARTITION BY seg ORDER BY score DESC, _gf_master) AS rn
            FROM scored)
          WHERE rn = 1 AND score >= 85.0)
        SELECT c.c_custkey, coalesce(b._gf_master, c.seg) AS seg
        FROM src c LEFT JOIN best b USING (seg)
        ORDER BY c.c_custkey""")),

    // multi-format datetime parsing with coerce-to-null fallback.
    Q("normalize_datetime",
      (s, dir) => {
        val o = Tables.orders(s, dir).withColumn("date_str",
          when(col("o_orderkey") % 3 === 0, date_format(col("o_orderdate"), "yyyy/MM/dd"))
            .when(col("o_orderkey") % 3 === 1, date_format(col("o_orderdate"), "MM-dd-yyyy"))
            .otherwise(lit("not a date")))
        val (out, _) = Normalizer(o, NormalizeConfig(
          parseDatetimes = Map("date_str" -> Seq("yyyy/MM/dd", "MM-dd-yyyy"))))
        out.select(col("o_orderkey"), col("date_str").as("parsed"))
          .orderBy("o_orderkey")
      },
      Some("""
        SELECT o_orderkey,
               coalesce(try_strptime(date_str, '%Y/%m/%d'),
                        try_strptime(date_str, '%m-%d-%Y')) AS parsed
        FROM (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y/%m/%d')
                      WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%m-%d-%Y')
                      ELSE 'not a date' END AS date_str
          FROM orders)
        ORDER BY o_orderkey""")),

    // dtype coercion with try_cast (failed -> NULL).
    Q("normalize_cast",
      (s, dir) => {
        val e = Tables.events(s, dir).withColumn("uid_str",
          when(col("event_id") % 5 === 0, lit("bad"))
            .otherwise(col("user_id").cast("string")))
        val (out, _) = Normalizer(e, NormalizeConfig(
          coerceTypes = Map("uid_str" -> "bigint")))
        out.select(col("event_id"), col("uid_str").as("uid"))
          .orderBy("event_id")
      },
      Some("""
        SELECT event_id,
               TRY_CAST(CASE WHEN event_id % 5 = 0 THEN 'bad'
                             ELSE CAST(user_id AS VARCHAR) END AS BIGINT) AS uid
        FROM events ORDER BY event_id""")),

    // Jaro-Winkler best-master scoring (native JaroWinklerSim expression),
    // pinned cross-engine against DuckDB's jaro_winkler_similarity.
    Q("normalize_jw",
      (s, dir) => {
        import graft.functions.JaroWinkler.jaroWinkler
        val dirty = Tables.customer(s, dir)
          .withColumn("seg",
            when(col("c_custkey") % 7 === 0, concat(col("c_mktsegment"), lit("x")))
              .otherwise(col("c_mktsegment")))
          .filter(!col("seg").isin(segments: _*))
          .select("seg").distinct()
        val master = s.createDataFrame(segments.map(Tuple1(_))).toDF("master")
        val scored = dirty.crossJoin(broadcast(master))
          .withColumn("score", jaroWinkler(col("seg"), col("master")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("seg").orderBy(col("score").desc, col("master"))
        scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
          .select(col("seg"), col("master").as("corrected"),
            graft.Num.dround(col("score"), 4).as("score"))
          .orderBy("seg")
      },
      Some(s"""
        WITH dirty AS (
          SELECT DISTINCT CASE WHEN c_custkey % 7 = 0 THEN c_mktsegment || 'x'
                               ELSE c_mktsegment END AS seg
          FROM customer),
        unknown AS (SELECT seg FROM dirty
                    WHERE seg NOT IN (${segments.map(v => s"'$v'").mkString(",")})),
        master AS (SELECT * FROM (VALUES ${segments.map(v => s"('$v')").mkString(",")}) m(master)),
        scored AS (
          SELECT seg, master, jaro_winkler_similarity(seg, master) AS score,
                 row_number() OVER (PARTITION BY seg
                   ORDER BY jaro_winkler_similarity(seg, master) DESC, master) AS rnk
          FROM unknown, master)
        SELECT seg, master AS corrected,
               floor(score * 1e4 + 0.5) / 1e4 AS score
        FROM scored WHERE rnk = 1 ORDER BY seg""")),

    // Unicode NFC canonicalization (UAX #15) via the native
    // UnicodeNormalize expression — the pre-dedup step a multilingual
    // corpus cannot skip: composed U+00E9 and decomposed e+U+0301 are
    // the same text to a reader but different bytes to every fingerprint
    // / gram join / shingle. Docs ≡ 0 (mod 4) get a decomposed suffix
    // planted (combining acute U+0301, the commonest class), so the
    // normalizer has live work at every scale; DuckDB's nfc_normalize is
    // the oracle — the normalized TEXT itself is hash-compared, plus
    // codepoint counts before/after (each composition shortens by one).
    Q("normalize_nfc",
      (s, dir) => {
        import graft.functions.UnicodeNorm.unicodeNormalize
        val planted = Tables.documents(s, dir).select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" cafe\u0301 re\u0301sume\u0301")))
            .otherwise(col("text")).as("text"))
        planted.select(col("doc_id"),
            unicodeNormalize(col("text"), "NFC").as("text_nfc"),
            length(col("text")).as("n_before"),
            length(unicodeNormalize(col("text"), "NFC")).as("n_after"))
          .withColumn("changed", col("n_before") =!= col("n_after"))
          .orderBy("doc_id")
      },
      Some("""
        WITH planted AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0
                   THEN text || ' cafe' || chr(769) || ' re' || chr(769)
                        || 'sume' || chr(769)
                   ELSE text END AS text
          FROM documents)
        SELECT doc_id, nfc_normalize(text) AS text_nfc,
               CAST(length(text) AS INT) AS n_before,
               CAST(length(nfc_normalize(text)) AS INT) AS n_after,
               length(text) <> length(nfc_normalize(text)) AS changed
        FROM planted ORDER BY doc_id""")),

    // Blocked record linkage (SURVEY row 134): dirty part names (last 3
    // chars lost) matched back to the distinct master catalog — candidates
    // from an EQUI-join on the 4-char blocking prefix (never all-pairs),
    // winner per dirty value via one map-side-combined min_by argmax, the
    // codegen'd native Jaro-Winkler in the pair loop.
    Q("link_records",
      (s, dir) => {
        val part = Tables.part(s, dir)
        val master = part.select(col("p_name")).distinct()
        val dirty = part.select(
          col("p_name").substr(lit(1), length(col("p_name")) - 3)
            .as("dirty_name")).distinct()
        graft.ops.RecordLinkage.bestMatch(
            dirty, "dirty_name", "dirty_name",
            master, "p_name", "p_name",
            blockKey = c => c.substr(1, 4), minScore = 0.8)
          .orderBy("dirty_name")
      },
      Some("""
        WITH master AS (SELECT DISTINCT p_name FROM part),
        dirty AS (SELECT DISTINCT substr(p_name, 1, length(p_name) - 3) AS dirty_name
                  FROM part),
        pairs AS (
          SELECT dirty_name, p_name,
                 jaro_winkler_similarity(dirty_name, p_name) AS s
          FROM dirty JOIN master
            ON substr(dirty_name, 1, 4) = substr(p_name, 1, 4)
          WHERE jaro_winkler_similarity(dirty_name, p_name) >= 0.8),
        best AS (
          SELECT dirty_name, p_name, s,
                 CAST(count(*) OVER (PARTITION BY dirty_name) AS BIGINT) AS n_candidates,
                 row_number() OVER (PARTITION BY dirty_name
                   ORDER BY s DESC, p_name) AS rn
          FROM pairs)
        SELECT dirty_name, p_name AS match_id,
               floor(s * 1e6 + 0.5) / 1e6 AS score, n_candidates
        FROM best WHERE rn = 1 ORDER BY dirty_name""")),

    // URL canonicalization (r14): scheme/host lowercased, default port +
    // fragment stripped, tracking params removed (order of survivors
    // preserved), empty path -> '/', non-URLs pass through trimmed. The
    // fixture plants every variant class deterministically.
    Q("normalize_url",
      (s, dir) => Tables.documents(s, dir).select(col("doc_id"))
        .withColumn("url", plantUrl)
        .select(col("doc_id"), col("url"),
          UrlOps.canonicalize(col("url")).as("url_canon"))
        .orderBy("doc_id"),
      Some(s"""
        WITH t AS (SELECT doc_id, $sqlPlantUrl AS url FROM documents)
        SELECT doc_id, url, ${UrlOps.sqlCanonicalize("url")} AS url_canon
        FROM t ORDER BY doc_id""")),

    // URL-keyed dedup (r14): the free FIRST dedup pass of a web-corpus
    // pipeline (RefinedWeb order) — group on the canonical form, keep the
    // smallest doc_id. The fixture maps ~10 raw variants onto each
    // canonical key (case, port, fragment, tracking-param churn).
    Q("dedup_url",
      (s, dir) => UrlOps.dedupByUrl(
          Tables.documents(s, dir).select(col("doc_id"))
            .withColumn("url", plantUrl),
          "doc_id", "url")
        .orderBy("url_canon"),
      Some(s"""
        WITH t AS (SELECT doc_id, $sqlPlantUrl AS url FROM documents),
        c AS (SELECT doc_id, ${UrlOps.sqlCanonicalize("url")} AS url_canon FROM t)
        SELECT url_canon, min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM c GROUP BY url_canon ORDER BY url_canon"""))
  )

  /** Deterministic URL planting over `documents`: three variant classes —
    * https with default port + tracking params + fragment (case-mangled
    * host), http:80 with a fbclid mixed among real params, and a
    * passthrough non-URL — built so ~10 raw forms collapse per canonical
    * key while real params (id=…) keep distinct keys distinct. */
  private def plantUrl = {
    val d = col("doc_id")
    when(d % 10 === 9, concat(lit("  not a url "), d.cast("string"), lit("  ")))
      .when(d % 3 === 0,
        concat(lit("HTTP://Example"), (d % 7).cast("string"),
          lit(".com:80/a/B"), (d % 20).cast("string"),
          lit("?x="), (d % 4).cast("string"),
          lit("&fbclid=f"), d.cast("string"), lit("&y=2")))
      .otherwise(
        concat(lit("HTTPS://WWW.Example"), (d % 7).cast("string"),
          lit(".COM:443/Path"), (d % 20).cast("string"),
          lit("?utm_source=feed&id="), (d % 4).cast("string"),
          lit("&utm_campaign=c"), d.cast("string"),
          lit("#sec"), d.cast("string")))
  }

  // def, not val: referenced from `all`'s initializer above — a val here
  // would still be null when the query list is built
  private def sqlPlantUrl: String =
    """CASE WHEN doc_id % 10 = 9
         THEN '  not a url ' || CAST(doc_id AS VARCHAR) || '  '
       WHEN doc_id % 3 = 0
         THEN 'HTTP://Example' || CAST(doc_id % 7 AS VARCHAR)
              || '.com:80/a/B' || CAST(doc_id % 20 AS VARCHAR)
              || '?x=' || CAST(doc_id % 4 AS VARCHAR)
              || '&fbclid=f' || CAST(doc_id AS VARCHAR) || '&y=2'
       ELSE 'HTTPS://WWW.Example' || CAST(doc_id % 7 AS VARCHAR)
              || '.COM:443/Path' || CAST(doc_id % 20 AS VARCHAR)
              || '?utm_source=feed&id=' || CAST(doc_id % 4 AS VARCHAR)
              || '&utm_campaign=c' || CAST(doc_id AS VARCHAR)
              || '#sec' || CAST(doc_id AS VARCHAR) END"""
}
