package graft.queries

import graft.Tables
import graft.dedup.Duplicates
import graft.outliers._
import org.apache.spark.sql.functions._

/** Driver-checked queries for SURVEY §2.1 rows 19-27 (duplicates +
  * outlier detect/handle). */
object DedupOutlierQueries {

  private val subset = Seq("o_custkey", "o_orderstatus")

  val all: Seq[Q] = Seq(
    Q("dupes_flag",
      (s, dir) => Duplicates.flag(Tables.orders(s, dir), subset)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "is_duplicate")
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus,
               count(*) OVER (PARTITION BY o_custkey, o_orderstatus) > 1 AS is_duplicate
        FROM orders ORDER BY o_orderkey""")),

    Q("dupes_clusters",
      (s, dir) => Duplicates.clusters(Tables.orders(s, dir), subset)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_custkey", "o_orderstatus", "o_orderkey"),
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus FROM (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 count(*) OVER (PARTITION BY o_custkey, o_orderstatus) AS cnt
          FROM orders)
        WHERE cnt > 1
        ORDER BY o_custkey, o_orderstatus, o_orderkey""")),

    Q("dupes_drop_first",
      (s, dir) => Duplicates.drop(Tables.orders(s, dir), subset,
          Duplicates.KeepFirst, Seq(col("o_orderkey")))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey, o_custkey, o_orderstatus FROM (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                   ORDER BY o_orderkey) AS rn
          FROM orders)
        WHERE rn = 1 ORDER BY o_orderkey""")),

    Q("dupes_drop_none",
      (s, dir) => Duplicates.drop(Tables.orders(s, dir), subset,
          Duplicates.KeepNone, Nil)
        .select("o_orderkey").orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey FROM (
          SELECT o_orderkey,
                 count(*) OVER (PARTITION BY o_custkey, o_orderstatus) AS cnt
          FROM orders)
        WHERE cnt = 1 ORDER BY o_orderkey""")),

    // sf0.01 prices carry no natural IQR outliers (the gate matched on
    // empty frames) — plant 100× price spikes on mod-97 first lines (the
    // mod-7 fixture-corruption precedent) so detect/bounds/row-filter all
    // see discriminating mass at driver scale.
    Q("outliers_iqr",
      (s, dir) => {
        val li = Tables.lineitem(s, dir).withColumn("l_extendedprice",
          when(col("l_orderkey") % 97 === 0 && col("l_linenumber") === 1,
            col("l_extendedprice") * 100).otherwise(col("l_extendedprice")))
        val det = Outliers.detect(li, Map("l_extendedprice" -> Iqr(1.5)))
        Outliers.outlierRows(det)
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        WITH li AS (
          SELECT l_orderkey, l_linenumber,
                 CASE WHEN l_orderkey % 97 = 0 AND l_linenumber = 1
                      THEN l_extendedprice * 100 ELSE l_extendedprice END
                   AS l_extendedprice
          FROM lineitem),
        b AS (
          SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q1,
                 quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q3
          FROM li)
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM li, b
        WHERE l_extendedprice < q1 - 1.5 * (q3 - q1)
           OR l_extendedprice > q3 + 1.5 * (q3 - q1)
        ORDER BY l_orderkey, l_linenumber""")),

    // MAD (modified z-score, Iglewicz & Hoaglin): robust where mean/std
    // are dragged by the outliers being hunted. Two 1-row aggregate
    // passes (median, then deviation median) — the data never shuffles.
    Q("outliers_mad",
      (s, dir) => {
        val det = Outliers.detect(Tables.events(s, dir),
          Map("value" -> Mad(3.5)))
        Outliers.outlierRows(det)
          .select("event_id", "value")
          .orderBy("event_id")
      },
      Some("""
        WITH m AS (
          SELECT quantile_cont(CAST(value AS DOUBLE), 0.5) AS med FROM events),
        d AS (
          SELECT quantile_cont(abs(CAST(value AS DOUBLE) - med), 0.5) AS madv
          FROM events, m)
        SELECT event_id, value
        FROM events, m, d
        WHERE value < med - 3.5 * 1.4826 * madv
           OR value > med + 3.5 * 1.4826 * madv
        ORDER BY event_id""")),

    // Cohort-aware outlier audit: per-event_type IQR bounds — a value
    // ordinary for one segment is extreme for another; global bounds
    // under-flag heavy cohorts and over-flag light ones.
    Q("outliers_iqr_by",
      (s, dir) => Outliers.logBy(Tables.events(s, dir), "event_type",
          Map("value" -> Iqr(1.5)))
        .orderBy("event_type"),
      Some("""
        WITH b AS (
          SELECT event_type,
                 quantile_cont(CAST(value AS DOUBLE), 0.25) AS q1,
                 quantile_cont(CAST(value AS DOUBLE), 0.75) AS q3
          FROM events GROUP BY event_type),
        bb AS (SELECT event_type,
                      q1 - 1.5 * (q3 - q1) AS lo,
                      q3 + 1.5 * (q3 - q1) AS hi
               FROM b)
        SELECT e.event_type, 'value' AS column_name, 'iqr' AS method,
               CAST(count(e.value) AS BIGINT) AS n,
               CAST(coalesce(sum(CASE WHEN e.value < lo OR e.value > hi
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS outlier_count,
               floor(lo * 1e4 + 0.5) / 1e4 AS lower_bound,
               floor(hi * 1e4 + 0.5) / 1e4 AS upper_bound
        FROM events e LEFT JOIN bb USING (event_type)
        GROUP BY e.event_type, lo, hi ORDER BY event_type""")),

    // Cohort-aware MAD at exact DISCRETE medians (the per-group Mad lane
    // logBy refuses to approximate): both medians are data values from
    // bounded histograms, deviations stay exact 4dp decimals, and the
    // oracle replays median selection, deviation medians, the 1.4826
    // bounds, and the counts end to end. HASH-GREEN.
    Q("outliers_mad_by",
      (s, dir) => Outliers.madBy(Tables.events(s, dir), "event_type",
          "value", threshold = 3.5)
        .orderBy("event_type"),
      Some {
        val sc = 3.5 * 1.4826
        s"""
        WITH vals AS (
          SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v
          FROM events WHERE value IS NOT NULL),
        h1 AS (SELECT event_type, v, count(*) AS c FROM vals GROUP BY 1, 2),
        c1 AS (SELECT event_type, v,
                 sum(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n
               FROM h1),
        med AS (SELECT event_type, max(n) AS n,
                  min(CASE WHEN cum >= ceil(CAST(0.5 AS DOUBLE) * n) THEN v END) AS med
                FROM c1 GROUP BY 1),
        devs AS (SELECT vals.event_type, vals.v, med.med,
                   abs(v - med) AS d
                 FROM vals JOIN med USING (event_type)),
        h2 AS (SELECT event_type, CAST(d AS DECIMAL(18,4)) AS d, count(*) AS c
               FROM devs GROUP BY 1, 2),
        c2 AS (SELECT event_type, d,
                 sum(c) OVER (PARTITION BY event_type ORDER BY d) AS cum,
                 sum(c) OVER (PARTITION BY event_type) AS n
               FROM h2),
        madv AS (SELECT event_type,
                   min(CASE WHEN cum >= ceil(CAST(0.5 AS DOUBLE) * n) THEN d END) AS madv
                 FROM c2 GROUP BY 1),
        bnd AS (SELECT m.event_type, m.n, m.med, madv.madv,
                  CAST(m.med AS DOUBLE) - $sc * CAST(madv.madv AS DOUBLE) AS lo,
                  CAST(m.med AS DOUBLE) + $sc * CAST(madv.madv AS DOUBLE) AS hi
                FROM med m JOIN madv USING (event_type))
        SELECT v.event_type, CAST(max(b.n) AS BIGINT) AS n,
               ${Q.sqlDround("CAST(min(b.med) AS DOUBLE)", 4)} AS median,
               ${Q.sqlDround("CAST(min(b.madv) AS DOUBLE)", 4)} AS mad,
               ${Q.sqlDround("min(b.lo)", 4)} AS lower,
               ${Q.sqlDround("min(b.hi)", 4)} AS upper,
               CAST(sum(CASE WHEN CAST(v.v AS DOUBLE) < b.lo
                 OR CAST(v.v AS DOUBLE) > b.hi THEN 1 ELSE 0 END) AS BIGINT)
                 AS outlier_count
        FROM vals v JOIN bnd b USING (event_type)
        GROUP BY v.event_type ORDER BY event_type"""
      }),

    // ANSI percent_rank of every distinct value WITHOUT a corpus sort:
    // ranks come from the bounded value histogram (rank = cum − c + 1,
    // ties share the min rank), so the fact table never sorts or
    // shuffles; per-row consumers broadcast-join this frame back. The
    // oracle is DuckDB's OWN window percent_rank() — an independent
    // implementation, not a mirror (the events_quantiles discipline).
    Q("events_percent_rank",
      (s, dir) => graft.ops.Quantiles.percentRanks(
          Tables.events(s, dir), "value", Seq("event_type"))
        .orderBy("event_type", "value"),
      Some(s"""
        SELECT DISTINCT event_type,
               ${Q.sqlDround("CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE)", 4)}
                 AS value,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
               ${Q.sqlDround(
                 "percent_rank() OVER (PARTITION BY event_type " +
                   "ORDER BY CAST(value AS DECIMAL(18,4)))", 6)} AS pr
        FROM events WHERE value IS NOT NULL
        ORDER BY event_type, value""")),

    Q("outliers_zscore",
      (s, dir) => {
        val det = Outliers.detect(Tables.events(s, dir),
          Map("value" -> ZScore(2.5)))
        Outliers.outlierRows(det)
          .select("event_id", "value").orderBy("event_id")
      },
      Some("""
        WITH b AS (
          SELECT avg(CAST(value AS DOUBLE)) AS mu,
                 stddev_samp(CAST(value AS DOUBLE)) AS sd
          FROM events)
        SELECT event_id, value FROM events, b
        WHERE value < mu - 2.5 * sd OR value > mu + 2.5 * sd
        ORDER BY event_id""")),

    Q("outliers_log",
      (s, dir) => {
        val det = Outliers.detect(Tables.lineitem(s, dir),
          Map("l_extendedprice" -> Iqr(1.5), "l_quantity" -> ZScore(3.0)))
        Outliers.log(det)
      },
      Some("""
        SELECT * FROM (
          SELECT 'l_extendedprice' AS column_name, 'iqr' AS method,
                 CAST(coalesce(sum(CASE WHEN l_extendedprice < q1 - 1.5*(q3-q1)
                   OR l_extendedprice > q3 + 1.5*(q3-q1) THEN 1 END), 0) AS BIGINT) AS outlier_count,
                 floor((any_value(q1 - 1.5*(q3-q1))) * 1e4 + 0.5) / 1e4 AS lower_bound,
                 floor((any_value(q3 + 1.5*(q3-q1))) * 1e4 + 0.5) / 1e4 AS upper_bound
          FROM lineitem, (
            SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q1,
                   quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q3
            FROM lineitem)
          UNION ALL
          SELECT 'l_quantity', 'zscore',
                 CAST(coalesce(sum(CASE WHEN l_quantity < mu - 3.0*sd
                   OR l_quantity > mu + 3.0*sd THEN 1 END), 0) AS BIGINT),
                 floor((any_value(mu - 3.0*sd)) * 1e4 + 0.5) / 1e4,
                 floor((any_value(mu + 3.0*sd)) * 1e4 + 0.5) / 1e4
          FROM lineitem, (
            SELECT avg(CAST(l_quantity AS DOUBLE)) AS mu,
                   stddev_samp(CAST(l_quantity AS DOUBLE)) AS sd
            FROM lineitem)
        ) ORDER BY column_name""")),

    Q("outliers_clip",
      (s, dir) => {
        val det = Outliers.detect(Tables.lineitem(s, dir),
          Map("l_extendedprice" -> Iqr(1.5)))
        Outliers.handle(det, Map("l_extendedprice" -> Clip))
          .select(col("l_orderkey"), col("l_linenumber"),
            graft.Num.dround(col("l_extendedprice"), 2).as("price"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""
        WITH b AS (
          SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q1,
                 quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q3
          FROM lineitem)
        SELECT l_orderkey, l_linenumber,
               floor((CASE
                 WHEN l_extendedprice < q1 - 1.5*(q3-q1) THEN q1 - 1.5*(q3-q1)
                 WHEN l_extendedprice > q3 + 1.5*(q3-q1) THEN q3 + 1.5*(q3-q1)
                 ELSE l_extendedprice END) * 1e2 + 0.5) / 1e2 AS price
        FROM lineitem, b
        ORDER BY l_orderkey, l_linenumber""")),

    Q("outliers_replace_median",
      (s, dir) => {
        val det = Outliers.detect(Tables.events(s, dir),
          Map("value" -> ZScore(2.5)))
        Outliers.handle(det, Map("value" -> ReplaceMedian))
          .select(col("event_id"), graft.Num.dround(col("value"), 2).as("value"))
          .orderBy("event_id")
      },
      Some("""
        WITH b AS (
          SELECT avg(CAST(value AS DOUBLE)) AS mu,
                 stddev_samp(CAST(value AS DOUBLE)) AS sd,
                 quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
          FROM events)
        SELECT event_id,
               floor((CASE WHEN value < mu - 2.5*sd OR value > mu + 2.5*sd
                 THEN med ELSE value END) * 1e2 + 0.5) / 1e2 AS value
        FROM events, b
        ORDER BY event_id""")),

    Q("outliers_drop",
      (s, dir) => {
        val det = Outliers.detect(Tables.lineitem(s, dir),
          Map("l_extendedprice" -> Iqr(1.5), "l_quantity" -> ZScore(3.0)))
        Outliers.handle(det, Map("l_extendedprice" -> DropRows))
          .agg(count(lit(1)).as("remaining"))
      },
      Some("""
        SELECT CAST(count(*) AS BIGINT) AS remaining
        FROM lineitem,
          (SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q1,
                  quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q3
           FROM lineitem),
          (SELECT avg(CAST(l_quantity AS DOUBLE)) AS mu,
                  stddev_samp(CAST(l_quantity AS DOUBLE)) AS sd
           FROM lineitem)
        WHERE NOT (l_extendedprice < q1 - 1.5*(q3-q1) OR l_extendedprice > q3 + 1.5*(q3-q1))
          AND NOT (l_quantity < mu - 3.0*sd OR l_quantity > mu + 3.0*sd)"""))
    ,

    // Per-group winsorization summary (§2 row 158): bounds at the EXACT
    // discrete p01/p99 ranks (values from the data, never interpolated),
    // selected via row_number so no engine's builtin quantile flavor is
    // in the loop; exact-decimal clipped means. The oracle replays rank
    // selection, clipping, and both means.
    Q("outliers_winsorize",
      (s, dir) => Outliers.winsorize(Tables.lineitem(s, dir),
          "l_extendedprice", Seq("l_returnflag"), pLo = 0.01, pHi = 0.99)
        .orderBy("l_returnflag"),
      Some(s"""
        WITH vals AS (
          SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(18,4)) AS v
          FROM lineitem WHERE l_extendedprice IS NOT NULL),
        ranked AS (
          SELECT l_returnflag, v,
                 row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS rn,
                 count(*) OVER (PARTITION BY l_returnflag) AS n
          FROM vals),
        bounds AS (
          SELECT l_returnflag, max(n) AS n,
                 min(CASE WHEN rn = ceil(CAST(0.01 AS DOUBLE) * n) THEN v END) AS lo,
                 min(CASE WHEN rn = ceil(CAST(0.99 AS DOUBLE) * n) THEN v END) AS hi
          FROM ranked GROUP BY 1),
        cl AS (
          SELECT r.l_returnflag, b.n, b.lo, b.hi, r.v,
                 least(greatest(r.v, b.lo), b.hi) AS vw
          FROM vals r JOIN bounds b USING (l_returnflag))
        SELECT l_returnflag, max(n) AS n,
               ${Q.sqlDround("CAST(min(lo) AS DOUBLE)", 4)} AS lo,
               ${Q.sqlDround("CAST(min(hi) AS DOUBLE)", 4)} AS hi,
               CAST(sum(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
               CAST(sum(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
               ${Q.sqlDround("CAST(round(sum(v), 2) AS DOUBLE) / count(*)", 4)}
                 AS mean_before,
               ${Q.sqlDround("CAST(round(sum(vw), 2) AS DOUBLE) / count(*)", 4)}
                 AS mean_after
        FROM cl GROUP BY 1 ORDER BY l_returnflag"""))
  )
}
