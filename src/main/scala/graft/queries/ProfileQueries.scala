package graft.queries

import graft.Tables
import graft.profile.{Distributions, Profiler}
import org.apache.spark.sql.functions._

/** Driver-checked queries for SURVEY §2.1 rows 1-5 (profiling). The DuckDB
  * oracles are generated per-column UNION ALL blocks mirroring the one-pass
  * Spark aggregation.
  */
object ProfileQueries {

  /** (column -> Spark simpleString dtype), needed because the oracle must
    * emit the same dtype literal the Spark plan emits. */
  private val customerSchema = Seq(
    "c_acctbal" -> "double", "c_custkey" -> "bigint", "c_mktsegment" -> "string",
    "c_name" -> "string", "c_nationkey" -> "int")

  private def schemaProfileSql(table: String, schema: Seq[(String, String)]): String =
    schema.map { case (c, t) =>
      s"""SELECT '$c' AS column_name, '$t' AS dtype,
            CAST(count($c) AS BIGINT) AS non_null,
            CAST(count(*) - count($c) AS BIGINT) AS null_count,
            floor(((count(*) - count($c)) * 100.0 / count(*)) * 1e2 + 0.5) / 1e2 AS missing_pct,
            CAST(count(DISTINCT $c) AS BIGINT) AS distinct_count
          FROM $table"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY column_name")

  /** (column, decimal magnitude exponent E with |x| ≤ 10^E) — drives the
    * power-sum quantization in Profiler.describe; must be identical on
    * both engines. */
  private val lineitemNumeric = Seq(
    "l_discount" -> 0, "l_extendedprice" -> 6, "l_linenumber" -> 1,
    "l_orderkey" -> 7, "l_partkey" -> 6, "l_quantity" -> 2,
    "l_suppkey" -> 5, "l_tax" -> 0)

  /** Mirrors Profiler.describe's exactMoments path: the SAME decimal power
    * sums and the SAME double expression tree (IEEE ops are deterministic
    * but not associative — grouping must match the Spark plan exactly). */
  private def describeSql(table: String, cols: Seq[(String, Int)],
                          groupCol: Option[String] = None): String =
    cols.map { case (c, e) =>
      val x = s"CAST($c AS DOUBLE)"
      def mul(k: Int) = s"1e${14 - k * e}"
      def powSum(k: Int) = {
        val xk = Seq.fill(k)(x).mkString(" * ")
        s"CAST(sum(CAST(floor(($xk) * ${mul(k)} + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / ${mul(k)}"
      }
      val gSel = groupCol.map(g => s"$g, ").getOrElse("")
      val gGroup = groupCol.map(g => s" GROUP BY $g").getOrElse("")
      s"""SELECT $gSel'$c' AS column_name,
            CAST(cnt AS BIGINT) AS n,
            floor((mean) * 1e4 + 0.5) / 1e4 AS mean,
            floor((sqrt(greatest(vs, 0.0))) * 1e4 + 0.5) / 1e4 AS stddev,
            floor((mn) * 1e4 + 0.5) / 1e4 AS min,
            floor((qa) * 1e4 + 0.5) / 1e4 AS q1,
            floor((qb) * 1e4 + 0.5) / 1e4 AS median,
            floor((qc) * 1e4 + 0.5) / 1e4 AS q3,
            floor((mx) * 1e4 + 0.5) / 1e4 AS max,
            floor((g1 * sqrt(n * (n - 1.0)) / (n - 2.0)) * 1e4 + 0.5) / 1e4 AS skew,
            floor((((n - 1.0) / ((n - 2.0) * (n - 3.0))) * ((n + 1.0) * g2 + 6.0)) * 1e4 + 0.5) / 1e4 AS kurtosis
          FROM (
            SELECT *,
                   m3 / sqrt(m2 * m2 * m2) AS g1,
                   m4 / (m2 * m2) - 3.0 AS g2
            FROM (
              SELECT *,
                     s2 / n - mean * mean AS m2,
                     s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean AS m3,
                     s4 / n - 4.0 * mean * (s3 / n) + 6.0 * mean * mean * (s2 / n) - 3.0 * mean * mean * mean * mean AS m4,
                     (s2 - s1 * s1 / n) / (n - 1.0) AS vs
              FROM (
                SELECT *, s1 / n AS mean
                FROM (
                  SELECT ${gSel}count($x) AS cnt,
                         CAST(count($x) AS DOUBLE) AS n,
                         ${powSum(1)} AS s1,
                         ${powSum(2)} AS s2,
                         ${powSum(3)} AS s3,
                         ${powSum(4)} AS s4,
                         min($x) AS mn, max($x) AS mx,
                         quantile_cont($x, 0.25) AS qa,
                         quantile_cont($x, 0.5) AS qb,
                         quantile_cont($x, 0.75) AS qc
                  FROM $table$gGroup))))"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n",
      s"\n) ORDER BY ${groupCol.map(g => s"$g, ").getOrElse("")}column_name")

  val all: Seq[Q] = Seq(
    Q("profile_schema",
      (s, dir) => Profiler.schemaProfile(Tables.customer(s, dir), exact = true),
      Some(schemaProfileSql("customer", customerSchema))),

    Q("profile_describe",
      (s, dir) => Profiler.describe(
        Tables.lineitem(s, dir), lineitemNumeric.map(_._1), exactQuantiles = true,
        exactMoments = true, magExp = lineitemNumeric.toMap),
      Some(describeSql("lineitem", lineitemNumeric))),

    Q("profile_high_cardinality",
      (s, dir) => Profiler.highCardinality(Tables.customer(s, dir), 10, exact = true),
      Some("""
        SELECT column_name, distinct_count FROM (
          SELECT 'c_name' AS column_name,
                 CAST(count(DISTINCT c_name) AS BIGINT) AS distinct_count FROM customer
          UNION ALL
          SELECT 'c_mktsegment',
                 CAST(count(DISTINCT c_mktsegment) AS BIGINT) FROM customer
        ) WHERE distinct_count > 10
        ORDER BY distinct_count DESC, column_name""")),

    Q("profile_dup_summary",
      (s, dir) => Profiler.duplicateSummary(Tables.orders(s, dir), Seq("o_custkey")),
      Some("""
        SELECT CAST(duplicate_rows AS BIGINT) AS duplicate_rows,
               CAST(duplicate_groups AS BIGINT) AS duplicate_groups,
               floor((duplicate_rows * 100.0 / total_rows) * 1e2 + 0.5) / 1e2 AS duplicate_pct
        FROM (
          SELECT coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS duplicate_rows,
                 coalesce(sum(CASE WHEN cnt > 1 THEN 1 END), 0) AS duplicate_groups,
                 sum(cnt) AS total_rows
          FROM (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1))""")),

    Q("profile_value_counts",
      (s, dir) => Profiler.valueCounts(Tables.orders(s, dir), "o_orderpriority"),
      Some("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY 1
        ORDER BY cnt DESC, o_orderpriority""")),

    // pandas groupby().describe() — per-group descriptive stats in one
    // grouped aggregation pass.
    Q("profile_describe_by",
      (s, dir) => Profiler.describeBy(
        Tables.lineitem(s, dir), Seq("l_returnflag"),
        Seq("l_quantity", "l_extendedprice", "l_discount"),
        exactQuantiles = true, exactMoments = true,
        magExp = lineitemNumeric.toMap),
      Some(describeSql("lineitem",
        Seq("l_quantity", "l_extendedprice", "l_discount")
          .map(c => c -> lineitemNumeric.toMap.apply(c)),
        groupCol = Some("l_returnflag")))),

    // The data behind the reference's histogram plots
    // (m08_visuals/distributions.py:29-33, bins=30).
    Q("profile_histogram",
      (s, dir) => Distributions.histogram(
        Tables.lineitem(s, dir), Seq("l_quantity", "l_extendedprice", "l_discount"), 30),
      Some(histogramSql("lineitem",
        Seq("l_quantity", "l_extendedprice", "l_discount"), 30))),

    // The data behind the reference's correlation heatmap
    // (m08_visuals/summary_plots.py:60, numeric_df.corr()).
    Q("profile_correlation",
      (s, dir) => Distributions.correlationMatrix(
        Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
        exact = true, magExp = lineitemNumeric.toMap),
      Some(corrSql("lineitem",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(c => c -> lineitemNumeric.toMap.apply(c))))),

    // Spearman rank correlation (pandas .corr(method='spearman')).
    Q("profile_spearman",
      (s, dir) => Distributions.spearmanMatrix(
        Tables.lineitem(s, dir), Seq("l_quantity", "l_extendedprice", "l_discount")),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val pairs = for { (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1) } yield (a, b)
        pairs.map { case (a, b) =>
          def rankSub(c: String) =
            s"""(SELECT v, (cum - cnt) + (cnt + 1.0) / 2.0 AS r FROM (
                  SELECT CAST($c AS DOUBLE) AS v, count(*) AS cnt,
                         sum(count(*)) OVER (ORDER BY CAST($c AS DOUBLE)
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                  FROM lineitem WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1))"""
          s"""SELECT '$a' AS col_x, '$b' AS col_y,
                CASE WHEN (n * saa - sa * sa) > 0 AND (n * sbb - sb * sb) > 0
                     THEN floor(((n * sab - sa * sb)
                       / (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb))) * 1e4 + 0.5) / 1e4
                     ELSE NULL END AS rho
              FROM (
                SELECT CAST(sum(cnt) AS DOUBLE) AS n,
                       CAST(sum(CAST(cnt * ra AS DECIMAL(38,1))) AS DOUBLE) AS sa,
                       CAST(sum(CAST(cnt * rb AS DECIMAL(38,1))) AS DOUBLE) AS sb,
                       CAST(sum(CAST(cnt * ra * ra AS DECIMAL(38,2))) AS DOUBLE) AS saa,
                       CAST(sum(CAST(cnt * rb * rb AS DECIMAL(38,2))) AS DOUBLE) AS sbb,
                       CAST(sum(CAST(cnt * ra * rb AS DECIMAL(38,2))) AS DOUBLE) AS sab
                FROM (
                  SELECT pc.cnt, ra.r AS ra, rb.r AS rb FROM
                    (SELECT CAST($a AS DOUBLE) AS va, CAST($b AS DOUBLE) AS vb, count(*) AS cnt
                     FROM lineitem WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2) pc
                    JOIN ${rankSub(a)} ra ON pc.va = ra.v
                    JOIN ${rankSub(b)} rb ON pc.vb = rb.v))"""
        }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_x, col_y")
      }),

    // Quantize-first Spearman — the 100 TB scale path (values bucket into
    // 64 equal-width bins BEFORE the rank window, bounding its input to 64
    // rows per column regardless of cardinality), hash-checked against a
    // DuckDB mirror of the identical bucket arithmetic.
    Q("profile_spearman_q",
      (s, dir) => Distributions.spearmanMatrix(
        Tables.lineitem(s, dir), Seq("l_quantity", "l_extendedprice", "l_discount"),
        quantize = 64),
      Some {
        val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
        val pairs = for { (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1) } yield (a, b)
        val boundsSel = cols.flatMap(c => Seq(
          s"min(CAST($c AS DOUBLE)) AS lo_$c", s"max(CAST($c AS DOUBLE)) AS hi_$c"))
          .mkString(", ")
        // Mirrors Distributions.quantizeExpr exactly: same IEEE ops in the
        // same order (width division inside, floor, clamp).
        def qe(c: String) =
          s"CASE WHEN hi_$c = lo_$c THEN 0.0 ELSE least(63.0, greatest(0.0, " +
            s"floor((CAST($c AS DOUBLE) - lo_$c) / ((hi_$c - lo_$c) / 64.0)))) END"
        pairs.map { case (a, b) =>
          def rankSub(c: String) =
            s"""(SELECT v, (cum - cnt) + (cnt + 1.0) / 2.0 AS r FROM (
                  SELECT ${qe(c)} AS v, count(*) AS cnt,
                         sum(count(*)) OVER (ORDER BY ${qe(c)}
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                  FROM lineitem CROSS JOIN (SELECT $boundsSel FROM lineitem) bounds
                  WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1))"""
          s"""SELECT '$a' AS col_x, '$b' AS col_y,
                CASE WHEN (n * saa - sa * sa) > 0 AND (n * sbb - sb * sb) > 0
                     THEN floor(((n * sab - sa * sb)
                       / (sqrt(n * saa - sa * sa) * sqrt(n * sbb - sb * sb))) * 1e4 + 0.5) / 1e4
                     ELSE NULL END AS rho
              FROM (
                SELECT CAST(sum(cnt) AS DOUBLE) AS n,
                       CAST(sum(CAST(cnt * ra AS DECIMAL(38,1))) AS DOUBLE) AS sa,
                       CAST(sum(CAST(cnt * rb AS DECIMAL(38,1))) AS DOUBLE) AS sb,
                       CAST(sum(CAST(cnt * ra * ra AS DECIMAL(38,2))) AS DOUBLE) AS saa,
                       CAST(sum(CAST(cnt * rb * rb AS DECIMAL(38,2))) AS DOUBLE) AS sbb,
                       CAST(sum(CAST(cnt * ra * rb AS DECIMAL(38,2))) AS DOUBLE) AS sab
                FROM (
                  SELECT pc.cnt, ra.r AS ra, rb.r AS rb FROM
                    (SELECT ${qe(a)} AS va, ${qe(b)} AS vb, count(*) AS cnt
                     FROM lineitem CROSS JOIN (SELECT $boundsSel FROM lineitem) bounds
                     WHERE $a IS NOT NULL AND $b IS NOT NULL GROUP BY 1, 2) pc
                    JOIN ${rankSub(a)} ra ON pc.va = ra.v
                    JOIN ${rankSub(b)} rb ON pc.vb = rb.v))"""
        }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_x, col_y")
      }),

    // Value-concentration profile: Shannon entropy + modal share per column.
    Q("profile_entropy",
      (s, dir) => Profiler.entropyProfile(
        Tables.customer(s, dir), Seq("c_custkey", "c_mktsegment", "c_nationkey")),
      Some(Seq("c_custkey", "c_mktsegment", "c_nationkey").map { c =>
        s"""SELECT '$c' AS column_name, CAST(n AS BIGINT) AS n,
              CAST(k AS BIGINT) AS distinct_vals,
              floor(((ln(nd) - s / nd) / ln(2.0)) * 1e4 + 0.5) / 1e4 AS entropy_bits,
              floor((CASE WHEN k = 1 THEN 0.0
                          ELSE (ln(nd) - s / nd) / ln(CAST(k AS DOUBLE)) END) * 1e4 + 0.5) / 1e4 AS entropy_norm,
              floor((CAST(top AS DOUBLE) / nd) * 1e4 + 0.5) / 1e4 AS top_ratio
            FROM (
              SELECT sum(cnt) AS n, CAST(sum(cnt) AS DOUBLE) AS nd,
                     count(*) AS k, max(cnt) AS top,
                     CAST(sum(CAST(floor(cnt * ln(CAST(cnt AS DOUBLE)) * 1e4 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e4 AS s
              FROM (SELECT count(*) AS cnt FROM customer WHERE $c IS NOT NULL GROUP BY $c))"""
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY column_name"))),

    // Categorical association audit: MI + chi-squared + Cramér's V.
    Q("profile_assoc",
      (s, dir) => Profiler.association(
        Tables.customer(s, dir),
        Seq(("c_mktsegment", "c_nationkey"))),
      Some("""
        SELECT 'c_mktsegment' AS col_x, 'c_nationkey' AS col_y,
               CAST(n AS BIGINT) AS n,
               floor((greatest(s, 0.0) / n / ln(2.0)) * 1e4 + 0.5) / 1e4 AS mi_bits,
               floor(greatest(schi - n, 0.0) * 1e4 + 0.5) / 1e4 AS chi2,
               CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
               CASE WHEN ka > 1 AND kb > 1
                    THEN floor(sqrt(greatest(schi - n, 0.0)
                        / (n * least(ka - 1, kb - 1))) * 1e4 + 0.5) / 1e4
                    ELSE NULL END AS cramers_v
        FROM (
          SELECT max(n) AS n, max(ka) AS ka, max(kb) AS kb,
                 CAST(sum(CAST(floor(cnt * (ln(CAST(cnt AS DOUBLE) * CAST(n AS DOUBLE))
                     - ln(CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))) * 1e4 + 0.5)
                   AS DECIMAL(38,0))) AS DOUBLE) / 1e4 AS s,
                 CAST(sum(CAST(floor(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE) * CAST(n AS DOUBLE)
                     / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)) * 1e4 + 0.5)
                   AS DECIMAL(38,0))) AS DOUBLE) / 1e4 AS schi
          FROM (
            SELECT j.cnt, ma.ca, mb.cb, t.n, ka.ka, kb.kb FROM
              (SELECT CAST(c_mktsegment AS VARCHAR) AS va, CAST(c_nationkey AS VARCHAR) AS vb,
                      count(*) AS cnt
               FROM customer WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
               GROUP BY 1, 2) j
              JOIN (SELECT CAST(c_mktsegment AS VARCHAR) AS va, count(*) AS ca
                    FROM customer WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
                    GROUP BY 1) ma ON j.va = ma.va
              JOIN (SELECT CAST(c_nationkey AS VARCHAR) AS vb, count(*) AS cb
                    FROM customer WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL
                    GROUP BY 1) mb ON j.vb = mb.vb,
              (SELECT count(*) AS n FROM customer
               WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL) t,
              (SELECT count(DISTINCT c_mktsegment) AS ka FROM customer
               WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL) ka,
              (SELECT count(DISTINCT c_nationkey) AS kb FROM customer
               WHERE c_mktsegment IS NOT NULL AND c_nationkey IS NOT NULL) kb))""")),

    // Format-mask profile: top value shapes of the events JSON props.
    Q("profile_masks",
      (s, dir) => Profiler.formatMasks(Tables.events(s, dir), "props", k = 10),
      Some("""
        WITH m AS (
          SELECT regexp_replace(regexp_replace(regexp_replace(
                   props, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'), '[0-9]', '9', 'g') AS mask
          FROM events WHERE props IS NOT NULL),
        g AS (SELECT mask, count(*) AS cnt FROM m GROUP BY 1),
        t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM g)
        SELECT mask, cnt,
               floor((CAST(cnt AS DOUBLE) / tot) * 1e4 + 0.5) / 1e4 AS pct
        FROM g, t ORDER BY cnt DESC, mask LIMIT 10""")),

    // Benford leading-digit audit of a financial column.
    Q("profile_benford",
      (s, dir) => Profiler.benford(Tables.lineitem(s, dir), "l_extendedprice"),
      Some("""
        WITH c AS (
          SELECT CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS cents
          FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
        d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
              FROM c WHERE cents > 0),
        g AS (SELECT digit, count(*) AS cnt FROM d GROUP BY 1),
        t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM g)
        SELECT digit, cnt,
               floor((CAST(cnt AS DOUBLE) / tot) * 1e4 + 0.5) / 1e4 AS pct,
               floor((ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0)) * 1e4 + 0.5) / 1e4 AS benford_pct
        FROM g, t ORDER BY digit"""))
  )

  /** Mirrors Distributions.histogram: same bounds, same IEEE bin/edge
    * expression trees (the bin width and edges must be computed with the
    * exact grouping Spark uses, or last-ulp drift flips a 4dp edge). */
  private def histogramSql(table: String, cols: Seq[String], bins: Int): String =
    cols.map { c =>
      val x = s"CAST($c AS DOUBLE)"
      s"""SELECT '$c' AS column_name, bin,
            floor((mn + bin * w) * 1e4 + 0.5) / 1e4 AS bin_lo,
            floor((mn + (bin + 1) * w) * 1e4 + 0.5) / 1e4 AS bin_hi,
            CAST(count(*) AS BIGINT) AS n
          FROM (
            SELECT CASE WHEN mx = mn THEN 0
                        ELSE CAST(least(${bins - 1}, floor((x - mn) / w)) AS INT) END AS bin,
                   mn, w
            FROM (SELECT $x AS x FROM $table WHERE $c IS NOT NULL),
                 (SELECT min($x) AS mn, max($x) AS mx,
                         (max($x) - min($x)) / $bins.0 AS w FROM $table))
          GROUP BY bin, mn, w"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY column_name, bin")

  /** Mirrors Distributions.correlationMatrix's exact path: identical
    * decimal-quantized sums, identical double recomposition tree. */
  private def corrSql(table: String, cols: Seq[(String, Int)]): String = {
    val pairs = for { (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1) } yield (a, b)
    pairs.map { case ((a, ea), (b, eb)) =>
      def m(e: Int) = s"1e${14 - e}"
      def dsum(expr: String, e: Int) =
        s"CAST(sum(CAST(floor(($expr) * ${m(e)} + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / ${m(e)}"
      val xa = s"CAST($a AS DOUBLE)"; val xb = s"CAST($b AS DOUBLE)"
      s"""SELECT '$a' AS col_x, '$b' AS col_y,
            floor(((n * sab - sa * sb) /
              (sqrt(greatest(n * saa - sa * sa, 0.0)) *
               sqrt(greatest(n * sbb - sb * sb, 0.0)))) * 1e4 + 0.5) / 1e4 AS corr
          FROM (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   ${dsum(xa, ea)} AS sa, ${dsum(xb, eb)} AS sb,
                   ${dsum(s"$xa * $xa", 2 * ea)} AS saa,
                   ${dsum(s"$xb * $xb", 2 * eb)} AS sbb,
                   ${dsum(s"$xa * $xb", ea + eb)} AS sab
            FROM $table WHERE $a IS NOT NULL AND $b IS NOT NULL)"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_x, col_y")
  }
}
