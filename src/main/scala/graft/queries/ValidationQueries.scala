package graft.queries

import graft.Tables
import graft.quality._
import org.apache.spark.sql.functions._

/** Driver-checked queries for SURVEY §2.1 rows 6-12 (validation). */
object ValidationQueries {

  /** The demo suite over `orders`: two rules are designed to fail on the
    * synthetic data (status 'P' outside whitelist; price cap) so the
    * violation machinery is actually exercised. */
  private val ordersRules: Seq[Rule] = Seq(
    NotNull("o_custkey"),
    InRange("o_totalprice", 0.0, 300000.0),
    InSet("o_orderstatus", Seq("F", "O")),
    ExpectedColumns(Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")),
    ExpectedType("o_orderkey", "bigint"),
    UniqueKey(Seq("o_orderkey")))

  val all: Seq[Q] = Seq(
    Q("validate_suite",
      (s, dir) => Validator.summary(Tables.orders(s, dir), ordersRules),
      Some("""
        SELECT * FROM (
          SELECT 'not_null' AS rule, 'o_custkey' AS column_name,
                 CAST(coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 END), 0) AS BIGINT) AS violation_count,
                 coalesce(sum(CASE WHEN o_custkey IS NULL THEN 1 END), 0) = 0 AS passed
          FROM orders
          UNION ALL
          SELECT 'numeric_range', 'o_totalprice',
                 CAST(coalesce(sum(CASE WHEN o_totalprice IS NOT NULL
                   AND NOT (o_totalprice BETWEEN 0.0 AND 300000.0) THEN 1 END), 0) AS BIGINT),
                 coalesce(sum(CASE WHEN o_totalprice IS NOT NULL
                   AND NOT (o_totalprice BETWEEN 0.0 AND 300000.0) THEN 1 END), 0) = 0
          FROM orders
          UNION ALL
          SELECT 'categorical_values', 'o_orderstatus',
                 CAST(coalesce(sum(CASE WHEN o_orderstatus IS NOT NULL
                   AND o_orderstatus NOT IN ('F','O') THEN 1 END), 0) AS BIGINT),
                 coalesce(sum(CASE WHEN o_orderstatus IS NOT NULL
                   AND o_orderstatus NOT IN ('F','O') THEN 1 END), 0) = 0
          FROM orders
          UNION ALL
          SELECT 'schema_conformity', '*', CAST(0 AS BIGINT), true
          UNION ALL
          SELECT 'dtype_enforcement', 'o_orderkey', CAST(0 AS BIGINT), true
          UNION ALL
          SELECT 'unique_key', 'o_orderkey',
                 CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT),
                 coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) = 0
          FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY 1)
        ) ORDER BY rule, column_name""")),

    Q("validate_categorical",
      (s, dir) => Validator.invalidValueSummary(
        Tables.orders(s, dir), InSet("o_orderstatus", Seq("F", "O"))),
      Some("""
        SELECT o_orderstatus AS invalid_value, CAST(count(*) AS BIGINT) AS cnt
        FROM orders
        WHERE o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O')
        GROUP BY 1 ORDER BY cnt DESC, invalid_value""")),

    Q("validate_range",
      (s, dir) => Validator.violations(
          Tables.orders(s, dir), Seq(InRange("o_totalprice", 0.0, 300000.0)))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey, round(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice IS NOT NULL
          AND NOT (o_totalprice BETWEEN 0.0 AND 300000.0)
        ORDER BY o_orderkey""")),

    Q("validate_row_coverage",
      (s, dir) => Validator.rowCoverage(Tables.orders(s, dir), ordersRules),
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS total_rows,
               CAST(coalesce(sum(CASE WHEN
                 (o_totalprice IS NOT NULL AND NOT (o_totalprice BETWEEN 0.0 AND 300000.0))
                 OR (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O'))
                 OR o_custkey IS NULL
                 THEN 1 END), 0) AS BIGINT) AS failing_rows,
               floor(((count(*) - coalesce(sum(CASE WHEN
                 (o_totalprice IS NOT NULL AND NOT (o_totalprice BETWEEN 0.0 AND 300000.0))
                 OR (o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O'))
                 OR o_custkey IS NULL
                 THEN 1 END), 0)) * 100.0 / count(*)) * 1e2 + 0.5) / 1e2 AS coverage_pct
        FROM orders""")),

    // Null audit over a frame with deterministic synthesized nulls (the
    // testdata has none): events.value nulled on every 10th event_id.
    Q("audit_nulls",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("value",
            when(col("event_id") % 10 === 0, lit(null)).otherwise(col("value")))
        Validator.summary(e, Seq(NotNull("value"), NotNull("user_id")))
      },
      Some("""
        SELECT * FROM (
          SELECT 'not_null' AS rule, 'value' AS column_name,
                 CAST(coalesce(sum(CASE WHEN event_id % 10 = 0 THEN 1 END), 0) AS BIGINT) AS violation_count,
                 coalesce(sum(CASE WHEN event_id % 10 = 0 THEN 1 END), 0) = 0 AS passed
          FROM events
          UNION ALL
          SELECT 'not_null', 'user_id',
                 CAST(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 END), 0) AS BIGINT),
                 coalesce(sum(CASE WHEN user_id IS NULL THEN 1 END), 0) = 0
          FROM events
        ) ORDER BY rule, column_name""")),

    // Referential integrity (cross-table): orders whose o_custkey points
    // at no surviving customer — orphans planted by dropping every 7th
    // customer from the dim side. Null FKs are NotNull's defect, not
    // this rule's.
    Q("validate_referential",
      (s, dir) => graft.quality.Validator.orphans(
          Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir).filter(col("c_custkey") % 7 =!= 0), "c_custkey")
        .orderBy("orphan_key"),
      Some("""
        SELECT o_custkey AS orphan_key, CAST(count(*) AS BIGINT) AS n_rows
        FROM orders
        WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_custkey % 7 <> 0 AND c_custkey IS NOT NULL)
        GROUP BY o_custkey ORDER BY orphan_key""")),

    // Functional-dependency audit: which sources violate source → lang
    // (multi-language feeds), with dependent cardinality and row mass.
    Q("profile_fd",
      (s, dir) => graft.quality.Validator.fdViolations(
          Tables.documents(s, dir), "source", "lang")
        .orderBy("determinant"),
      Some("""
        SELECT source AS determinant,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_dependents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM documents WHERE source IS NOT NULL
        GROUP BY source HAVING count(DISTINCT lang) > 1
        ORDER BY determinant""")),

    Q("validate_unique_key",
      (s, dir) => Validator.summary(Tables.lineitem(s, dir),
        Seq(UniqueKey(Seq("l_orderkey", "l_linenumber")), UniqueKey(Seq("l_partkey")))),
      Some("""
        SELECT * FROM (
          SELECT 'unique_key' AS rule, 'l_orderkey,l_linenumber' AS column_name,
                 CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT) AS violation_count,
                 coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) = 0 AS passed
          FROM (SELECT l_orderkey, l_linenumber, count(*) AS cnt FROM lineitem GROUP BY 1, 2)
          UNION ALL
          SELECT 'unique_key', 'l_partkey',
                 CAST(coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) AS BIGINT),
                 coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0) = 0
          FROM (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1)
        ) ORDER BY rule, column_name""")),

    // Regex conformance: order priority labels must look like "N-WORD...".
    Q("validate_regex",
      (s, dir) => Validator.summary(Tables.orders(s, dir),
        Seq(MatchesRegex("o_orderpriority", "^[0-9]-[A-Z ]+$"))),
      Some("""
        SELECT 'regex_match' AS rule, 'o_orderpriority' AS column_name,
               CAST(coalesce(sum(CASE WHEN o_orderpriority IS NOT NULL
                 AND NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$') THEN 1 END), 0) AS BIGINT) AS violation_count,
               coalesce(sum(CASE WHEN o_orderpriority IS NOT NULL
                 AND NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$') THEN 1 END), 0) = 0 AS passed
        FROM orders"""))
  )
}
