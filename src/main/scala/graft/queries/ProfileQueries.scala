package graft.queries

import graft.Tables
import graft.profile.Profiler
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

  private val lineitemNumeric = Seq(
    "l_discount", "l_extendedprice", "l_linenumber", "l_orderkey",
    "l_partkey", "l_quantity", "l_suppkey", "l_tax")

  private def describeSql(table: String, cols: Seq[String]): String =
    cols.map { c =>
      val x = s"CAST($c AS DOUBLE)"
      s"""SELECT '$c' AS column_name,
            CAST(count($x) AS BIGINT) AS n,
            floor((avg($x)) * 1e4 + 0.5) / 1e4 AS mean,
            floor((stddev_samp($x)) * 1e4 + 0.5) / 1e4 AS stddev,
            floor((min($x)) * 1e4 + 0.5) / 1e4 AS min,
            floor((quantile_cont($x, 0.25)) * 1e4 + 0.5) / 1e4 AS q1,
            floor((quantile_cont($x, 0.5)) * 1e4 + 0.5) / 1e4 AS median,
            floor((quantile_cont($x, 0.75)) * 1e4 + 0.5) / 1e4 AS q3,
            floor((max($x)) * 1e4 + 0.5) / 1e4 AS max,
            floor((skewness($x)) * 1e4 + 0.5) / 1e4 AS skew,
            floor((kurtosis($x)) * 1e4 + 0.5) / 1e4 AS kurtosis
          FROM $table"""
    }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY column_name")

  val all: Seq[Q] = Seq(
    Q("profile_schema",
      (s, dir) => Profiler.schemaProfile(Tables.customer(s, dir), exact = true),
      Some(schemaProfileSql("customer", customerSchema))),

    Q("profile_describe",
      (s, dir) => Profiler.describe(
        Tables.lineitem(s, dir), lineitemNumeric, exactQuantiles = true),
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
        ORDER BY cnt DESC, o_orderpriority"""))
  )
}
