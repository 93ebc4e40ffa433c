package graft.queries

import graft.Tables
import graft.infer.ConfigInference
import graft.impute.Imputer
import graft.outliers.{Clip, Outliers}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checked queries for the reference's auto-heal surface
  * (mcp_server/tools/{infer_configs,auto_heal}.py): infer cleaning configs
  * from the data, then apply them. */
object InferQueries {

  /** orders with deterministic dirt: nulls in price (%17) + status (%13). */
  private def dirtyOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 17 === 0, lit(null)).otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 13 === 0, lit(null)).otherwise(col("o_orderstatus")))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")

  val all: Seq[Q] = Seq(
    // Inference audit artifact. The oracle hardcodes the rule OUTCOMES
    // (they are static given this schema + synthesized dirt) but computes
    // the data-dependent whitelist from the data like the engine does.
    Q("infer_configs",
      (s, dir) => ConfigInference.suggestions(dirtyOrders(s, dir)),
      Some("""
        SELECT * FROM (
          SELECT 'imputation' AS kind, 'o_orderstatus' AS column_name, 'mode' AS suggestion
          UNION ALL SELECT 'imputation', 'o_totalprice', 'median'
          UNION ALL SELECT 'outlier_spec', 'o_totalprice', 'iqr(1.5)'
          UNION ALL SELECT 'categorical_whitelist', 'o_orderstatus',
            (SELECT string_agg(v, ',' ORDER BY v) FROM
              (SELECT DISTINCT o_orderstatus AS v FROM orders
               WHERE o_orderkey % 13 != 0) t)
          UNION ALL SELECT 'categorical_whitelist', 'o_orderpriority',
            (SELECT string_agg(v, ',' ORDER BY v) FROM
              (SELECT DISTINCT o_orderpriority AS v FROM orders) t)
          UNION ALL SELECT 'expected_type', 'o_orderkey', 'bigint'
          UNION ALL SELECT 'expected_type', 'o_custkey', 'bigint'
          UNION ALL SELECT 'expected_type', 'o_orderstatus', 'string'
          UNION ALL SELECT 'expected_type', 'o_totalprice', 'double'
          UNION ALL SELECT 'expected_type', 'o_orderpriority', 'string'
        ) ORDER BY kind, column_name""")),

    // Auto-heal: infer, then impute + clip per the inferred config.
    Q("auto_heal",
      (s, dir) => {
        val dirty = dirtyOrders(s, dir)
        val cfg = ConfigInference.infer(dirty)
        val imputed = Imputer.impute(dirty, cfg.imputation)
        val det = Outliers.detect(imputed, cfg.outlierSpecs)
        Outliers.handle(det, cfg.outlierSpecs.keys.map(_ -> (Clip: graft.outliers.HandleStrategy)).toMap)
          .select(col("o_orderkey"), col("o_orderstatus"),
            graft.Num.dround(col("o_totalprice"), 2).as("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""
        WITH d AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_orderstatus END AS st,
                 CASE WHEN o_orderkey % 17 = 0 THEN NULL ELSE o_totalprice END AS tp
          FROM orders),
        md AS (SELECT quantile_cont(CAST(tp AS DOUBLE), 0.5) AS med FROM d),
        mo AS (SELECT st AS fill FROM (
          SELECT st, count(*) AS c FROM d WHERE st IS NOT NULL
          GROUP BY 1 ORDER BY c DESC, st LIMIT 1)),
        d2 AS (SELECT o_orderkey, coalesce(st, fill) AS st, coalesce(tp, med) AS tp
               FROM d, md, mo),
        b AS (SELECT quantile_cont(CAST(tp AS DOUBLE), 0.25) AS q1,
                     quantile_cont(CAST(tp AS DOUBLE), 0.75) AS q3 FROM d2)
        SELECT o_orderkey, st AS o_orderstatus,
               floor((CASE WHEN tp < q1 - 1.5*(q3-q1) THEN q1 - 1.5*(q3-q1)
                          WHEN tp > q3 + 1.5*(q3-q1) THEN q3 + 1.5*(q3-q1)
                          ELSE tp END) * 1e2 + 0.5) / 1e2 AS o_totalprice
        FROM d2, b ORDER BY o_orderkey"""))
  )
}
