package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Core analytics substrate queries (SURVEY §2.2) — the group-by / join /
  * window / rollup engine every QA operator rides on. Plans are declarative
  * so Catalyst pushes filters/projections to the parquet scan; dimension
  * tables are explicitly `broadcast` so the 100 TB fact side never shuffles
  * for a join.
  */
object CoreQueries {
  import Q._

  val all: Seq[Q] = Seq(
    // TPC-H Q1-style pricing summary: single scan, map-side partial aggs.
    Q("q1_agg",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val disc  = money(col("l_extendedprice")) * (one - rate(col("l_discount")))
        val charge = disc * (one + rate(col("l_tax")))
        l.groupBy("l_returnflag", "l_linestatus").agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          decSum(disc).as("sum_disc_price"),
          decSum(charge).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
          ${sqlDsum("l_quantity")} AS sum_qty,
          ${sqlDsum("l_extendedprice")} AS sum_base_price,
          ${sqlDecSum(s"""${sqlMoney("l_extendedprice")} * ($sqlOne - ${sqlRate("l_discount")})""")} AS sum_disc_price,
          ${sqlDecSum(s"""${sqlMoney("l_extendedprice")} * ($sqlOne - ${sqlRate("l_discount")}) * ($sqlOne + ${sqlRate("l_tax")})""")} AS sum_charge,
          ${sqlDavg("l_quantity")} AS avg_qty,
          ${sqlDavg("l_discount")} AS avg_disc,
          CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // Revenue by nation: fact scans join broadcast dims — no fact shuffle
    // until the (tiny-key) final aggregation.
    Q("q3_join",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
        val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
        l.select(col("l_orderkey"),
            (money(col("l_extendedprice")) * (one - rate(col("l_discount")))).as("rev"))
          .join(o.select("o_orderkey", "o_custkey"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(decSum(col("rev")).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      Some(s"""
        SELECT n_name,
          ${sqlDecSum(s"""${sqlMoney("l_extendedprice")} * ($sqlOne - ${sqlRate("l_discount")})""")} AS revenue,
          CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name""")),

    // Window: top-3 orders by price per priority class (rank in group).
    Q("q_window_topn",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.select(col("o_orderpriority"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"),
            row_number().over(w).as("rk"))
          .filter(col("rk") <= 3)
          .orderBy("o_orderpriority", "rk")
      },
      Some("""
        SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price, rk
        FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 CAST(row_number() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
          FROM orders)
        WHERE rk <= 3
        ORDER BY o_orderpriority, rk""")),

    // Rollup: order counts by status with subtotals + grand total.
    Q("q_rollup",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.rollup("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .select(
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("total"))
          .orderBy("status", "priority")
      },
      Some(s"""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               CAST(count(*) AS BIGINT) AS n,
               ${sqlDsum("o_totalprice")} AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // Anti join: customers with no orders (left_anti keeps build side tiny
    // when orders' keys are aggregated first). Every sf0.01 customer has
    // orders, so the raw anti-join matches on EMPTY frames — no
    // discriminating mass at driver scale; drop mod-13 custkeys from the
    // orders side (the mod-7 fixture-corruption precedent) so the gate
    // exercises real anti-join rows in both engines.
    Q("q_antijoin",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
          .where(col("o_custkey") % 13 =!= 0)
          .select("o_custkey").distinct()
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_custkey % 13 <> 0)
        ORDER BY c_custkey""")),

    // Semi join: customers that DO have orders (dedup'd probe side).
    Q("q_semijoin",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).select("o_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
        ORDER BY c_custkey""")),

    // Pivot: average order price per status x priority matrix.
    Q("q_pivot",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        o.groupBy("o_orderstatus")
          .pivot("o_orderpriority", prios)
          .agg(davg(col("o_totalprice")))
          .select(col("o_orderstatus").as("status"),
            col("1-URGENT").as("p1_urgent"), col("2-HIGH").as("p2_high"),
            col("3-MEDIUM").as("p3_medium"),
            col("4-NOT SPECIFIED").as("p4_not_specified"),
            col("5-LOW").as("p5_low"))
          .orderBy("status")
      },
      Some(s"""
        SELECT o_orderstatus AS status,
          ${sqlDavg("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS p1_urgent,
          ${sqlDavg("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END")} AS p2_high,
          ${sqlDavg("CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_totalprice END")} AS p3_medium,
          ${sqlDavg("CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_totalprice END")} AS p4_not_specified,
          ${sqlDavg("CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END")} AS p5_low
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY status""")),

    // Event-time tumbling window aggregation (the batch expression of the
    // Structured Streaming plan in graft.streaming — same window() call).
    Q("events_window_agg",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
          .select(col("w.start").as("window_start"), col("event_type"),
            col("n"), col("total_value"))
          .orderBy("window_start", "event_type")
      },
      Some(s"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
               CAST(count(*) AS BIGINT) AS n,
               ${sqlDsum("value")} AS total_value
        FROM events
        GROUP BY 1, 2
        ORDER BY window_start, event_type""")),

    // HLL approximate distinct — the 100 TB cardinality path (rows-only:
    // DuckDB's approx_count_distinct uses a different sketch).
    Q("approx_distinct",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.agg(approx_count_distinct(col("user_id")).as("approx_users"),
          count(lit(1)).cast(LongType).as("n_events"))
      },
      None),

    // Rolling window-frame aggregates per user: 5-row moving average and
    // running total over the event stream, ordered on the µs timestamp with
    // event_id as the deterministic tiebreak. Decimal-accumulated frames
    // (plain double window sums are frame-order-dependent cross-engine).
    Q("events_rolling",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val ord = Seq(unix_micros(col("ts")), col("event_id"))
        val w5 = Window.partitionBy("user_id").orderBy(ord: _*).rowsBetween(-4, 0)
        val wc = Window.partitionBy("user_id").orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables.events(s, dir)
          .filter(col("user_id").isNotNull && col("value").isNotNull)
          .select(
            col("user_id"), col("event_id"),
            graft.Num.dround(
              sum(col("value").cast(DecimalType(30, 6))).over(w5).cast(DoubleType)
                / count(col("value")).over(w5), 4).as("mov_avg"),
            round(sum(col("value").cast(DecimalType(30, 6))).over(wc), 2)
              .cast(DoubleType).as("cum_sum"))
          .orderBy("user_id", "event_id")
      },
      Some("""
        SELECT user_id, event_id,
               floor((CAST(sum(CAST(value AS DECIMAL(30,6))) OVER w5 AS DOUBLE)
                   / count(value) OVER w5) * 1e4 + 0.5) / 1e4 AS mov_avg,
               CAST(round(sum(CAST(value AS DECIMAL(30,6))) OVER wc, 2) AS DOUBLE) AS cum_sum
        FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        WINDOW w5 AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
               wc AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id"""))
  )
}
