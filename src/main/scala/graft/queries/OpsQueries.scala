package graft.queries

import graft.Tables
import graft.ops.{AsofJoin, Binning, EventAnalytics, RangeJoin}
import org.apache.spark.sql.functions._

/** Driver-checked queries for the time-series/operator additions
  * (as-of join; SURVEY §2.2). The DuckDB oracle uses its native
  * `ASOF LEFT JOIN`, so the single-shuffle window formulation in
  * [[graft.ops.AsofJoin]] is checked against a real independent as-of
  * implementation, not a mirror of itself. */
object OpsQueries {

  val all: Seq[Q] = Seq(
    // Each click matched to the user's most recent purchase at-or-before
    // the click. Right side pre-aggregated to one row per (user, ts) so
    // "the" as-of match is well-defined in both engines.
    Q("events_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("value").as("pval"))
        AsofJoin.backward(clicks, purchases, Seq("user_id"), "ts", "ts",
            valueCols = Seq("pval"), suffix = "_p")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("ts_p").as("purchase_ts"), col("pval_p").as("purchase_value"))
          .orderBy("event_id")
      },
      Some("""
        WITH clicks AS (
          SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        purch AS (
          SELECT user_id, ts, max(value) AS pval
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        SELECT c.event_id, c.user_id, c.ts,
               p.ts AS purchase_ts, p.pval AS purchase_value
        FROM clicks c ASOF LEFT JOIN purch p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        ORDER BY c.event_id""")),

    // Interval join: clicks landing inside [purchase, purchase + 1h) per
    // user, counted per purchase (zero-click purchases kept). The bucket
    // width equals the interval span, so each interval explodes to ≤ 2
    // bucket rows. The DuckDB oracle is a plain inequality join — an
    // independent implementation, not a mirror.
    Q("events_range_join",
      (s, dir) => {
        val hourUs = 3600L * 1000000L
        val ev = Tables.events(s, dir)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("cus"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_micros(col("ts")).as("pus"))
          .withColumn("end_us", col("pus") + lit(hourUs))
        val matched = RangeJoin.intervalJoin(clicks, "cus",
          purchases, "pus", "end_us", Seq("user_id"), bucketWidth = hourUs)
        val counts = matched.groupBy("purchase_id")
          .agg(count(lit(1)).as("n_clicks"))
        purchases.select("purchase_id")
          .join(counts, Seq("purchase_id"), "left")
          .select(col("purchase_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
          .orderBy("purchase_id")
      },
      Some("""
        WITH clicks AS (
          SELECT user_id, epoch_us(ts) AS cus FROM events WHERE event_type = 'click'),
        purch AS (
          SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pus
          FROM events WHERE event_type = 'purchase')
        SELECT p.purchase_id, CAST(count(c.cus) AS BIGINT) AS n_clicks
        FROM purch p LEFT JOIN clicks c
          ON p.user_id = c.user_id AND c.cus >= p.pus AND c.cus < p.pus + 3600000000
        GROUP BY p.purchase_id ORDER BY p.purchase_id""")),

    // pandas qcut: quartile membership of every order by total price.
    // Exact path = ANSI ntile over the (value, key) total order, so any
    // SQL engine reproduces it bit-for-bit.
    Q("q_qcut",
      (s, dir) => Binning.equalFrequency(
        Tables.orders(s, dir), "o_totalprice", q = 4,
        tiebreak = Seq("o_orderkey"), exact = true)
        .select("o_orderkey", "bin").orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey, CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS bin
        FROM orders WHERE o_totalprice IS NOT NULL
        ORDER BY o_orderkey""")),

    // Ordered first-touch funnel view → click → purchase.
    Q("events_funnel",
      (s, dir) => EventAnalytics.funnel(
        Tables.events(s, dir), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase")),
      Some("""
        WITH s0 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
                    WHERE event_type = 'view' AND user_id IS NOT NULL
                      AND ts IS NOT NULL GROUP BY 1),
        s1 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
               JOIN s0 USING (user_id)
               WHERE e.event_type = 'click' AND epoch_us(e.ts) > s0.t GROUP BY 1),
        s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
               JOIN s1 USING (user_id)
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s1.t GROUP BY 1),
        c AS (
          SELECT 0 AS step_idx, 'view' AS step, (SELECT count(*) FROM s0) AS n_users
          UNION ALL
          SELECT 1, 'click', (SELECT count(*) FROM s1)
          UNION ALL
          SELECT 2, 'purchase', (SELECT count(*) FROM s2))
        SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
               floor((CAST(n_users AS DOUBLE)
                   / CAST(first_value(n_users) OVER (ORDER BY step_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE))
                 * 1e4 + 0.5) / 1e4 AS pct_of_first
        FROM c ORDER BY step_idx""")),

    // Day-granularity cohort retention over the event log.
    Q("events_retention",
      (s, dir) => EventAnalytics.retention(Tables.events(s, dir), "user_id", "ts"),
      Some("""
        WITH active AS (
          SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS d
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        fd AS (SELECT u, min(d) AS cohort_day FROM active GROUP BY 1),
        c AS (
          SELECT cohort_day, d - cohort_day AS day_offset, count(*) AS n_users
          FROM active JOIN fd USING (u) GROUP BY 1, 2)
        SELECT cohort_day, day_offset, CAST(n_users AS BIGINT) AS n_users,
               CASE WHEN day_offset = 0 THEN 1.0
                    ELSE floor((CAST(n_users AS DOUBLE)
                        / CAST(first_value(n_users) OVER (PARTITION BY cohort_day
                            ORDER BY day_offset
                            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE))
                      * 1e4 + 0.5) / 1e4 END AS retention_pct
        FROM c ORDER BY cohort_day, day_offset""")),

    // Kaplan-Meier survival over user lifetimes (§2 row 171 — Kaplan &
    // Meier 1958): the censoring-honest upgrade of events_retention —
    // users still active in the final week are censored, not counted as
    // churn; the product-limit curve multiplies 6dp factors in PINNED
    // ascending order on both engines (Spark ordered-window fold,
    // DuckDB list_reduce over an ordered window list), so the IEEE
    // chain replays exactly. Lifetimes ride the sporadic 'purchase'
    // slice (all-event lifetimes span the whole window — nothing would
    // churn). HASH-GREEN.
    Q("events_survival",
      (s, dir) => graft.ops.EventAnalytics.survival(
          Tables.events(s, dir).filter(col("event_type") === "purchase"),
          "user_id", "ts", censorDays = 7)
        .orderBy("t_day"),
      Some("""
        WITH kme AS (SELECT CAST(user_id AS BIGINT) AS u,
                            epoch_us(ts) // 86400000000 AS d
                     FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
                       AND event_type = 'purchase'),
        kmh AS (SELECT max(d) AS hmax FROM kme),
        kmp AS (SELECT u, max(d) - min(d) AS t_day,
                       (max(d) > hmax - 7) AS cens
                FROM kme, kmh GROUP BY u, hmax),
        kmt AS (SELECT t_day,
                  CAST(sum(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_events,
                  CAST(sum(CASE WHEN cens THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_censored
                FROM kmp GROUP BY 1),
        kmr AS (SELECT *, CAST(sum(n_events + n_censored)
                  OVER (ORDER BY t_day DESC) AS BIGINT) AS n_risk FROM kmt),
        kmf AS (SELECT *, floor((1.0 - CAST(n_events AS DOUBLE)
                  / CAST(n_risk AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS f FROM kmr),
        kml AS (SELECT *, list(f) OVER (ORDER BY t_day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fs
                FROM kmf)
        SELECT t_day, n_risk, n_events, n_censored,
               floor(list_reduce(fs, (a, b) -> a * b) * 1e6 + 0.5) / 1e6
                 AS survival
        FROM kml ORDER BY t_day""")),

    // Join-key heavy-hitter diagnostic: decides whether a join needs the
    // salted path (Skew.saltedJoin).
    Q("profile_heavy_hitters",
      (s, dir) => graft.ops.Skew.heavyHitters(
          Tables.lineitem(s, dir), "l_orderkey", k = 10)
        .orderBy(col("cnt").desc, col("l_orderkey")),
      Some("""
        WITH c AS (SELECT l_orderkey, CAST(count(*) AS BIGINT) AS cnt
                   FROM lineitem GROUP BY 1),
        t AS (SELECT sum(cnt) AS total FROM c),
        top AS (SELECT l_orderkey, cnt FROM c ORDER BY cnt DESC, l_orderkey LIMIT 10)
        SELECT l_orderkey, cnt,
               floor((CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS share
        FROM top, t ORDER BY cnt DESC, l_orderkey""")),

    // Top-k per group WITHOUT a window: the bounded typed Aggregator
    // (ops/TopK) combines k-sized buffers map-side. Spark ≥3.5's partial
    // WindowGroupLimit already prunes the window form's exchange equally
    // (verified on this build — see TopK's scaladoc); what the aggregate
    // form additionally removes is BOTH partition-wide sorts, replacing
    // them with hash grouping + O(k) insertions. HASH-GREEN against the
    // ANSI row_number form: identical (score desc, id asc) semantics.
    Q("events_topk_agg",
      (s, dir) => graft.ops.TopK.perGroup(Tables.events(s, dir),
          Seq("event_type"), "value", "event_id", k = 3)
        .orderBy("event_type", "rank"),
      Some("""
        SELECT event_type, CAST(rn AS INT) AS rank, event_id AS id, value AS score
        FROM (SELECT event_type, event_id, value,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY value DESC, event_id) AS rn
              FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL)
        WHERE rn <= 3 ORDER BY event_type, rank""")),

    // Count-Min sketch vs exact counts: approximate frequencies in FIXED
    // d·w state — the bounded-memory counterpart of exact heavy hitters
    // for unbounded key domains, mergeable cell-wise across executors /
    // batches. HASH-GREEN: the row hashes are the portable Knuth scatter
    // folded by per-row primes (exact 64-bit arithmetic), so DuckDB
    // recomputes the SKETCH itself — collisions, overcounts and all —
    // not just a property of it. d=4, w=64 against 150 keys forces real
    // collisions, so the overcount column is live, and min-over-rows is
    // exercised, at every scale.
    Q("sketch_cms",
      (s, dir) => {
        val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
        val sk = graft.ops.CountMin.sketch(ev, "user_id", depth = 4, width = 64)
        val probes = ev.select("user_id").distinct()
        val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
        graft.ops.CountMin.estimate(sk, probes, "user_id", depth = 4, width = 64)
          .join(exact, Seq("user_id"))
          .select(col("user_id"), col("exact_cnt"), col("cms_est"),
            (col("cms_est") - col("exact_cnt")).as("overcount"))
          .orderBy("user_id")
      },
      Some(s"""
        WITH rws AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3),
        ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        cells AS (
          SELECT r.r AS rw, ${graft.ops.CountMin.sqlCellCase("user_id", "r.r", 4, 64)} AS cell,
                 CAST(count(*) AS BIGINT) AS cnt
          FROM ev, rws r GROUP BY 1, 2),
        probes AS (SELECT DISTINCT user_id FROM ev),
        pc AS (SELECT p.user_id, r.r AS rw,
                      ${graft.ops.CountMin.sqlCellCase("p.user_id", "r.r", 4, 64)} AS cell
               FROM probes p, rws r),
        est AS (SELECT user_id, min(coalesce(cnt, 0)) AS cms_est
                FROM pc LEFT JOIN cells USING (rw, cell) GROUP BY user_id),
        exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
                  FROM ev GROUP BY user_id)
        SELECT user_id, exact_cnt, cms_est, cms_est - exact_cnt AS overcount
        FROM est JOIN exact USING (user_id)
        ORDER BY user_id""")),

    // CMS join-size estimation (§2 row 169 — Cormode & Muthukrishnan
    // 2005 §4.2): the equi-join OUTPUT size predicted from two sketches'
    // cell-wise inner products (min over rows), never running the join —
    // the planner-side probe that decides broadcast vs shuffle vs salt
    // at 100 TB. Width 2^20 is a modulus, not storage (cells materialize
    // sparsely), which keeps the collision cross-mass readable. The
    // oracle recomputes both sketches, every inner product, and the
    // ratio verbatim. HASH-GREEN.
    Q("sketch_cms_join_size",
      (s, dir) => {
        val d = 3; val w = 1 << 20
        val l = Tables.lineitem(s, dir).select(col("l_orderkey").as("k"))
        val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"))
        val est = graft.ops.CountMin.joinSizeEstimate(
          graft.ops.CountMin.sketch(l, "k", d, w),
          graft.ops.CountMin.sketch(o, "k", d, w), d)
        val truth = l.join(o, "k").agg(count(lit(1)).as("true_join_size"))
        est.crossJoin(truth).select(col("est_join_size"),
          col("true_join_size"),
          Q.dround(col("est_join_size").cast("double") /
            col("true_join_size").cast("double"), 6).as("ratio"))
      },
      Some {
        val d = 3; val w = 1 << 20
        s"""
        WITH jrws AS (SELECT 0 AS r UNION ALL SELECT 1 UNION ALL SELECT 2),
        la AS (SELECT l_orderkey AS k FROM lineitem),
        ob AS (SELECT o_orderkey AS k FROM orders),
        ca AS (SELECT r.r AS rw,
                 ${graft.ops.CountMin.sqlCellCase("k", "r.r", d, w)} AS cell,
                 CAST(count(*) AS BIGINT) AS ca
               FROM la, jrws r GROUP BY 1, 2),
        cb AS (SELECT r.r AS rw,
                 ${graft.ops.CountMin.sqlCellCase("k", "r.r", d, w)} AS cell,
                 CAST(count(*) AS BIGINT) AS cb
               FROM ob, jrws r GROUP BY 1, 2),
        ip AS (SELECT rw, sum(ca * cb) AS ip
               FROM ca JOIN cb USING (rw, cell) GROUP BY rw),
        est AS (SELECT CAST(min(coalesce(ip.ip, 0)) AS BIGINT) AS est_join_size
                FROM jrws r LEFT JOIN ip ON ip.rw = r.r),
        tru AS (SELECT CAST(count(*) AS BIGINT) AS true_join_size
                FROM la JOIN ob USING (k))
        SELECT est_join_size, true_join_size,
               ${Q.sqlDround("CAST(est_join_size AS DOUBLE) / CAST(true_join_size AS DOUBLE)", 6)}
                 AS ratio
        FROM est, tru"""
      }),

    // Fixed-grid resample with zero-filled gaps: the 'error' slice on an
    // HOURLY grid — sparse enough at small scales that empty buckets
    // actually exercise (a missing bucket is an outage signal, not an
    // absent row). Grid size is TIME-bounded (hours in the span), never
    // data-bounded.
    Q("events_resample",
      (s, dir) => graft.ops.EventAnalytics.resample(
          Tables.events(s, dir).filter(col("event_type") === "error"),
          "ts", "hour", userCol = Some("user_id")),
      Some("""
        WITH f AS (SELECT ts, user_id FROM events
                   WHERE event_type = 'error' AND ts IS NOT NULL),
        b AS (SELECT date_trunc('hour', min(ts)) AS lo,
                     date_trunc('hour', max(ts)) AS hi FROM f),
        grid AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket FROM b),
        c AS (SELECT date_trunc('hour', ts) AS bucket,
                     CAST(count(*) AS BIGINT) AS n_events,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
              FROM f GROUP BY 1)
        SELECT epoch_us(bucket) AS hour_us,
               coalesce(n_events, 0) AS n_events,
               coalesce(n_users, 0) AS n_users
        FROM grid LEFT JOIN c USING (bucket) ORDER BY hour_us""")),

    // Latest record per entity (SCD-style current snapshot): one window
    // shuffle on the entity key; ties on ts break on event_id so the
    // survivor is deterministic.
    Q("events_latest",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, dir)
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .withColumn("_gf_rn", row_number().over(w))
          .filter(col("_gf_rn") === 1)
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
            col("event_type"), col("value"))
          .orderBy("user_id")
      },
      Some("""
        SELECT user_id, epoch_us(ts) AS ts_us, event_type, value
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        QUALIFY row_number() OVER (PARTITION BY user_id
          ORDER BY epoch_us(ts) DESC, event_id DESC) = 1
        ORDER BY user_id""")),

    // CDC changelog apply (the warehouse MERGE): a synthesized
    // Debezium-shaped log against the orders snapshot — updates (price
    // doubled), deletes, inserts (shifted keys), and a second-sequence
    // delete overriding an update for %100 keys, so latest-wins is
    // live. Untouched keys pass through. One window over the CHANGELOG
    // only + one key anti-join against the base. HASH-GREEN against the
    // ANSI row_number/anti-join/union mirror.
    Q("cdc_apply",
      (s, dir) => {
        val (o, batch1, batch2) = cdcFixture(s, dir)
        graft.ops.Cdc.applyChanges(o, batch1.unionByName(batch2),
            Seq("o_orderkey"), "seq", "op")
          .select(col("o_orderkey"), col("o_orderstatus"),
            Q.dround(col("o_totalprice").cast("double"), 4).as("price"))
          .orderBy("o_orderkey")
      },
      Some(cdcOracle)),

    // CDC PERSISTED lifecycle (§2 row 150's warehouse shape — the
    // Sharding/Ivf manifest-last discipline applied to a mutable
    // snapshot): write version 0, apply the seq-1 and seq-2 changelog
    // batches INCREMENTALLY (each commits a new immutable version
    // directory, manifest overwritten last; out-of-order/replayed
    // batches refused by the monotone-sequence guard), then re-open
    // the current version under its pinned schema. The final state is
    // definitionally the one-shot apply's, so it shares cdc_apply's
    // oracle — the incremental path is pinned to the composed-batch
    // ANSI mirror. HASH-GREEN.
    Q("cdc_apply_persisted",
      (s, dir) => {
        val (o, batch1, batch2) = cdcFixture(s, dir)
        val path = NearDupQueries.scratchIndexDir(s, "cdc", dir)
        graft.ops.Cdc.writeSnapshot(o, Seq("o_orderkey"), path)
        graft.ops.Cdc.applyBatch(s, path, batch1, Seq("o_orderkey"), "seq", "op")
        graft.ops.Cdc.applyBatch(s, path, batch2, Seq("o_orderkey"), "seq", "op")
        graft.ops.Cdc.readSnapshot(s, path)
          .select(col("o_orderkey"), col("o_orderstatus"),
            Q.dround(col("o_totalprice").cast("double"), 4).as("price"))
          .orderBy("o_orderkey")
      },
      Some(cdcOracle)),

    // CDC via the STREAMING operator run in batch degeneration (§2 row
    // 150's live twin): StreamOps.cdcLatest is the flatMapGroupsWithState
    // latest-wins fold a changelog STREAM maintains (compacted-topic
    // contract; StreamingSpec drives it across triggers with replay
    // suppression); on a batch frame it degenerates to applyChanges'
    // latest CTE, so composing it with the base anti-join must replay
    // cdc_apply's oracle verbatim — pinning batch ≡ stream at the gate
    // (the streamingCusum discipline applied to CDC). HASH-GREEN.
    Q("cdc_apply_streamed",
      (s, dir) => {
        val (o, batch1, batch2) = cdcFixture(s, dir)
        val latest = graft.streaming.StreamOps.cdcLatest(
          batch1.unionByName(batch2), "o_orderkey", "seq", "op")
        val ups = latest.filter(col("op") =!= "D")
          .select(from_json(col("payload"), o.schema).as("p")).select("p.*")
        val survivors = o.join(latest.select(col("key").as("o_orderkey")),
          Seq("o_orderkey"), "left_anti")
        survivors.unionByName(ups)
          .select(col("o_orderkey"), col("o_orderstatus"),
            Q.dround(col("o_totalprice").cast("double"), 4).as("price"))
          .orderBy("o_orderkey")
      },
      Some(cdcOracle)),

    // SCD2 change history — the versioned complement of events_latest:
    // per user, each event_type CHANGE opens a [valid_from, valid_to)
    // interval (half-open on the next change; open = current state),
    // consecutive equal states collapsing into one version. Total order
    // (ts, event_id) on both windows, which share one entity-keyed
    // shuffle; the change filter runs BEFORE version numbering so the
    // second window sees changes only. HASH-GREEN against the ANSI
    // lag/lead mirror at µs granularity.
    Q("events_scd2",
      (s, dir) => graft.ops.EventAnalytics.history(Tables.events(s, dir),
          "user_id", "ts", "event_type", tieCol = "event_id")
        .orderBy("user_id", "version"),
      Some("""
        WITH o AS (
          SELECT user_id, event_type, ts, event_id,
                 lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_us(ts), event_id) AS prev
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
            AND event_type IS NOT NULL),
        chg AS (
          SELECT user_id, event_type, ts, event_id FROM o
          WHERE prev IS NULL OR prev <> event_type),
        v AS (
          SELECT user_id,
                 row_number() OVER w2 AS version,
                 event_type AS state,
                 epoch_us(ts) AS valid_from_us,
                 epoch_us(lead(ts) OVER w2) AS valid_to_us
          FROM chg
          WINDOW w2 AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        SELECT user_id, CAST(version AS INT) AS version, state,
               valid_from_us, valid_to_us,
               valid_to_us IS NULL AS is_current
        FROM v ORDER BY user_id, version""")),

    // Batch degeneration of the stateful streaming funnel (same builder
    // StreamingSpec drives across triggers): one row per user per
    // first-reached step, strict ordering. The oracle derives each
    // step's first-reach time as min(ts) strictly after the previous
    // step's — the closed form of the fold.
    Q("events_streaming_funnel",
      (s, dir) => graft.streaming.StreamOps.streamingFunnel(
          Tables.events(s, dir), Seq("view", "click", "purchase"))
        .orderBy("user_id", "step_idx"),
      Some("""
        WITH e AS (
          SELECT user_id, epoch_us(ts) AS us, event_type FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        s0 AS (SELECT user_id, min(us) AS t FROM e
               WHERE event_type = 'view' GROUP BY 1),
        s1 AS (SELECT e.user_id, min(us) AS t FROM e JOIN s0 USING (user_id)
               WHERE event_type = 'click' AND us > s0.t GROUP BY 1),
        s2 AS (SELECT e.user_id, min(us) AS t FROM e JOIN s1 USING (user_id)
               WHERE event_type = 'purchase' AND us > s1.t GROUP BY 1)
        SELECT user_id, CAST(step_idx AS INT) AS step_idx, t AS ts_us FROM (
          SELECT user_id, 0 AS step_idx, t FROM s0
          UNION ALL SELECT user_id, 1, t FROM s1
          UNION ALL SELECT user_id, 2, t FROM s2)
        ORDER BY user_id, step_idx""")),

    // Rolling z-score anomaly flags per user series: decimal power sums
    // over the trailing frame keep the rolling reduction order-free and
    // engine-identical (same recipe as events_rolling).
    Q("events_rolling_anomaly",
      (s, dir) => EventAnalytics.rollingAnomaly(Tables.events(s, dir),
          "user_id", "ts", "value", orderTiebreak = "event_id",
          frame = 20, threshold = 3.0)
        .orderBy("user_id", "event_id"),
      Some("""
        WITH e AS (
          SELECT user_id, event_id, value,
                 count(value) OVER w AS n,
                 CAST(sum(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE) AS s1,
                 CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s2
          FROM events
          WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        v AS (
          SELECT user_id, event_id, value, n, s1 / n AS mean,
                 greatest((s2 - s1 * s1 / n) / (n - 1), 0.0) AS variance
          FROM e),
        z AS (
          SELECT user_id, event_id, value,
                 CASE WHEN n >= 2 AND variance > 0
                   THEN floor(((CAST(value AS DOUBLE) - mean) / sqrt(variance)) * 1e4 + 0.5) / 1e4
                   ELSE NULL END AS zscore
          FROM v)
        SELECT user_id, event_id, value, zscore,
               coalesce(abs(zscore) > 3.0, false) AS is_anomaly
        FROM z ORDER BY user_id, event_id""")),

    // Batch degeneration of the stream-stream interval join (the SAME
    // builder StreamingSpec runs as two live MemoryStream sides): clicks
    // attributed to same-user views within 30 min after the view.
    Q("events_stream_interval_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .select(col("ts"), col("user_id"), col("event_id").as("view_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts"), col("user_id"), col("event_id").as("click_id"))
        graft.streaming.StreamOps.intervalJoin(views, clicks, Seq("user_id"),
            before = "0 minutes", after = "30 minutes")
          .select(col("view_id"), col("click_id"))
          .orderBy("view_id", "click_id")
      },
      Some("""
        WITH v AS (SELECT epoch_us(ts) AS vus, user_id, event_id AS view_id
                   FROM events WHERE event_type = 'view'),
        c AS (SELECT epoch_us(ts) AS cus, user_id, event_id AS click_id
              FROM events WHERE event_type = 'click')
        SELECT view_id, click_id
        FROM v JOIN c ON v.user_id = c.user_id
          AND c.cus >= v.vus AND c.cus <= v.vus + 1800000000
        ORDER BY view_id, click_id""")),

    // Left-outer variant of the stream-stream interval join: views with NO
    // click inside their window survive null-padded — the attribution
    // "impression with no click" row a real pipeline needs. In streaming
    // the unmatched row is emitted on watermark expiry (StreamingSpec
    // proves the live two-stream timing); here the batch degeneration is
    // a plain left range join, oracle-checked.
    Q("events_stream_interval_join_outer",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val views = ev.filter(col("event_type") === "view")
          .select(col("ts"), col("user_id"), col("event_id").as("view_id"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("ts"), col("user_id"), col("event_id").as("click_id"))
        graft.streaming.StreamOps.intervalJoin(views, clicks, Seq("user_id"),
            before = "0 minutes", after = "30 minutes",
            joinType = "leftOuter")
          .select(col("view_id"), col("click_id"))
          .orderBy("view_id", "click_id")
      },
      Some("""
        WITH v AS (SELECT epoch_us(ts) AS vus, user_id, event_id AS view_id
                   FROM events WHERE event_type = 'view'),
        c AS (SELECT epoch_us(ts) AS cus, user_id, event_id AS click_id
              FROM events WHERE event_type = 'click')
        SELECT view_id, click_id
        FROM v LEFT JOIN c ON v.user_id = c.user_id
          AND c.cus >= v.vus AND c.cus <= v.vus + 1800000000
        ORDER BY view_id, click_id""")),

    // Z-order (Morton) layout value over two part columns — the write-side
    // clustering key for multi-predicate file pruning. The oracle rebuilds
    // the same min-max buckets and bit interleave from Layout's own SQL
    // fragments, so the quantization cannot drift between engines.
    Q("layout_zorder",
      (s, dir) => graft.ops.Layout.zorderBy(
          Tables.part(s, dir).select("p_partkey", "p_size", "p_retailprice"),
          Seq("p_size", "p_retailprice"), bits = 8)
        .select("p_partkey", "zval").orderBy("p_partkey"),
      Some {
        val (bounds, z) = graft.ops.Layout.sqlZValue(
          "part", Seq("p_size", "p_retailprice"), bits = 8)
        s"""
        SELECT p_partkey, CAST($z AS BIGINT) AS zval
        FROM part, ($bounds) b
        ORDER BY p_partkey"""
      }),

    // Poisson-bootstrap CI for per-type mean event value (§2 row 153):
    // the ENTIRE bootstrap is oracle-replayed — per-(row, replicate)
    // Knuth draws, the integer-threshold Poisson(1) inverse-CDF ladder,
    // exact-decimal weighted means, and the order-statistic interval —
    // so a hash match pins every replicate, not just the summary.
    Q("bootstrap_ci_mean",
      (s, dir) => graft.ops.Bootstrap.ciMean(
          Tables.events(s, dir), "event_id", "value",
          Seq("event_type"), replicates = 64, seedBase = 0L, alpha = 0.025)
        .orderBy("event_type"),
      Some {
        val B = 64
        val bucket = graft.ops.Bootstrap.sqlReplicateBucket("k", "b", 0L)
        val weight = graft.ops.Bootstrap.sqlPoissonWeight(bucket)
        s"""
        WITH base AS (
          SELECT event_type, event_id AS k, CAST(value AS DECIMAL(30,4)) AS v
          FROM events WHERE value IS NOT NULL),
        obs AS (
          SELECT event_type, count(*) AS n_rows,
                 ${Q.sqlDround("CAST(sum(v) AS DOUBLE) / count(*)", 6)} AS observed_mean
          FROM base GROUP BY 1),
        reps AS (
          SELECT event_type, b, sum(v * w) AS s, sum(w) AS n
          FROM (SELECT event_type, r.b AS b, v, $weight AS w
                FROM base CROSS JOIN
                  (SELECT unnest(generate_series(0, ${B - 1})) AS b) r)
          GROUP BY 1, 2 HAVING sum(w) > 0),
        means AS (
          SELECT event_type, b,
                 ${Q.sqlDround("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS m
          FROM reps),
        ranked AS (
          SELECT event_type, b, m,
                 row_number() OVER (PARTITION BY event_type ORDER BY m ASC, b ASC) AS r,
                 count(*) OVER (PARTITION BY event_type) AS cnt
          FROM means),
        sel AS (
          SELECT event_type, m, cnt FROM ranked
          WHERE r = CAST(ceil(CAST(0.025 AS DOUBLE) * cnt) AS INT)
             OR r = cnt + 1 - CAST(ceil(CAST(0.025 AS DOUBLE) * cnt) AS INT)),
        ci AS (SELECT event_type, min(m) AS ci_lo, max(m) AS ci_hi,
                      max(cnt) AS n_replicates
               FROM sel GROUP BY 1)
        SELECT obs.event_type, n_rows, observed_mean, ci_lo, ci_hi, n_replicates
        FROM obs JOIN ci USING (event_type)
        ORDER BY event_type"""
      }),

    // Exact distributed quantiles (§2 row 164): the value-histogram
    // path — no global sort, state bounded by the value DOMAIN. The
    // oracle is DuckDB's OWN quantile_disc (an independent exact
    // implementation, the AsofJoin-style strong oracle), not a mirror.
    Q("events_quantiles",
      (s, dir) => graft.ops.Quantiles.exact(
          Tables.events(s, dir), "value", Seq("event_type"),
          Seq(0.25, 0.5, 0.9, 0.99))
        .orderBy("event_type", "p"),
      Some {
        // quantile_disc takes CONSTANT probes only — one branch per p
        val branches = Seq("0.25", "0.5", "0.9", "0.99").map { p =>
          s"""SELECT event_type, CAST($p AS DOUBLE) AS p,
                CAST(quantile_disc(CAST(value AS DECIMAL(18,4)), $p) AS DOUBLE)
                  AS value
              FROM events WHERE value IS NOT NULL GROUP BY event_type"""
        }.mkString("\nUNION ALL\n")
        s"""
        SELECT * FROM (
        $branches
        ) ORDER BY event_type, p"""
      }),

    // Seasonal profile + seasonality strength (§2 row 163): per
    // (event_type, hour-of-day) exact-decimal means and the one-way
    // variance decomposition R² — the calibration step before any
    // seasonality-adjusted rule. Hour buckets are pure integer µs
    // arithmetic (no engine date/timezone semantics in the loop).
    Q("events_seasonal",
      (s, dir) => graft.ops.EventAnalytics.seasonalProfile(
          Tables.events(s, dir), "ts", "value", Seq("event_type"))
        .orderBy("event_type", "hour_of_day"),
      Some {
        val m = "(CAST(round(s, 2) AS DOUBLE) / n)"
        val mSq4 = s"(floor(($m * $m) * 1e4 + 0.5) / 1e4)"
        val term = s"CAST(floor(n * $mSq4 * 1e4 + 0.5) / 1e4 AS DECIMAL(30,4))"
        s"""
        WITH base AS (
          SELECT event_type,
                 (epoch_us(ts) // 3600000000) % 24 AS hour_of_day,
                 CAST(value AS DECIMAL(18,4)) AS v
          FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        pb AS (
          SELECT event_type, hour_of_day, count(*) AS n,
                 sum(v) AS s, sum(v * v) AS s2
          FROM base GROUP BY 1, 2),
        tot AS (
          SELECT event_type, sum(n) AS tn,
                 ${Q.sqlDround("CAST(round(sum(s), 2) AS DOUBLE) / sum(n)", 6)}
                   AS gmean,
                 CAST(round(sum(s2), 2) AS DOUBLE) AS ts2d,
                 CAST(round(sum($term), 2) AS DOUBLE) AS ssbd
          FROM pb GROUP BY 1),
        st AS (
          SELECT event_type,
                 CASE WHEN ts2d - tn * gmean * gmean > 0
                   THEN ${Q.sqlDround(
                     "(ssbd - tn * gmean * gmean) / (ts2d - tn * gmean * gmean)",
                     6)}
                 END AS seasonality_r2
          FROM tot)
        SELECT pb.event_type, pb.hour_of_day, pb.n,
               ${Q.sqlDround("CAST(round(pb.s, 2) AS DOUBLE) / pb.n", 4)}
                 AS mean_value,
               st.seasonality_r2
        FROM pb JOIN st ON pb.event_type = st.event_type
        ORDER BY pb.event_type, pb.hour_of_day"""
      }),

    // Ratio-metric bootstrap (§2 row 153): CI for Σnum/Σden per group —
    // the production pass-rate/CTR shape, both sides reweighted by the
    // SAME Poisson draw so the ratio's correlation structure survives
    // the resample. Metric: share of event-value mass above 40.
    Q("bootstrap_ci_rate",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .withColumn("num",
            when(col("value") > 40, col("value")).otherwise(lit(0.0)))
        graft.ops.Bootstrap.ciRatio(e, "event_id", "num", "value",
            Seq("event_type"), replicates = 64, seedBase = 0L, alpha = 0.025)
          .orderBy("event_type")
      },
      Some {
        val B = 64
        val bucket = graft.ops.Bootstrap.sqlReplicateBucket("k", "b", 0L)
        val weight = graft.ops.Bootstrap.sqlPoissonWeight(bucket)
        s"""
        WITH base AS (
          SELECT event_type, event_id AS k,
                 CAST(CASE WHEN value > 40 THEN value ELSE 0.0 END
                   AS DECIMAL(30,4)) AS num,
                 CAST(value AS DECIMAL(30,4)) AS den
          FROM events WHERE value IS NOT NULL),
        obs AS (
          SELECT event_type, count(*) AS n_rows,
                 ${Q.sqlDround(
                   "CAST(sum(num) AS DOUBLE) / CAST(sum(den) AS DOUBLE)", 6)}
                   AS observed_ratio
          FROM base GROUP BY 1),
        reps AS (
          SELECT event_type, b, sum(num * w) AS s, sum(den * w) AS n
          FROM (SELECT event_type, r.b AS b, num, den, $weight AS w
                FROM base CROSS JOIN
                  (SELECT unnest(generate_series(0, ${B - 1})) AS b) r)
          GROUP BY 1, 2 HAVING sum(den * w) > 0),
        means AS (
          SELECT event_type, b,
                 ${Q.sqlDround("CAST(s AS DOUBLE) / CAST(n AS DOUBLE)", 6)} AS m
          FROM reps),
        ranked AS (
          SELECT event_type, b, m,
                 row_number() OVER (PARTITION BY event_type ORDER BY m ASC, b ASC) AS r,
                 count(*) OVER (PARTITION BY event_type) AS cnt
          FROM means),
        sel AS (
          SELECT event_type, m, cnt FROM ranked
          WHERE r = CAST(ceil(CAST(0.025 AS DOUBLE) * cnt) AS INT)
             OR r = cnt + 1 - CAST(ceil(CAST(0.025 AS DOUBLE) * cnt) AS INT)),
        ci AS (SELECT event_type, min(m) AS ci_lo, max(m) AS ci_hi,
                      max(cnt) AS n_replicates
               FROM sel GROUP BY 1)
        SELECT obs.event_type, n_rows, observed_ratio, ci_lo, ci_hi, n_replicates
        FROM obs JOIN ci USING (event_type)
        ORDER BY event_type"""
      }),

    // Portable HyperLogLog registers (§2 row 154): the sketch ITSELF is
    // hash-compared — md5-prefix hash, top-p bucket, the integer
    // bit-length ladder for ρ, and the per-bucket max, all replayed by
    // DuckDB (the sketch_cms treatment applied to cardinality; row 44's
    // approx_count_distinct stays rows-only because xxhash64 is
    // Spark-internal — THIS sketch is the verifiable lane).
    Q("sketch_hll",
      (s, dir) => graft.ops.Hll.registers(
          Tables.documents(s, dir), "text", Seq("source"), p = 8)
        .orderBy("source", "bucket"),
      Some(s"""
        WITH $hllRegCte
        SELECT source, bucket, max_rho FROM regs
        ORDER BY source, bucket""")),

    // HLL estimate (§2 row 154): harmonic sum in exact integer units of
    // 2^-25, one final float divide, and the linear-counting small-range
    // branch — the full Flajolet et al. estimator, oracle-replayed.
    Q("sketch_hll_estimate",
      (s, dir) => graft.ops.Hll.estimate(
          Tables.documents(s, dir), "text", Seq("source"), p = 8)
        .orderBy("source"),
      Some(s"""
        WITH $hllRegCte,
        est AS (${graft.ops.Hll.sqlEstimateFromRegs("regs", Seq("source"), 8)})
        SELECT source, n_nonzero, v_zero, est_distinct
        FROM est ORDER BY source""")),

    // HLL set-overlap by inclusion-exclusion (§2 row 157): per source
    // pair, |A ∩ B| ≈ Ê(A) + Ê(B) − Ê(A ∪ B) where the union sketch is
    // the register-wise MAX — cross-shard contamination estimated from
    // m-register arithmetic, never a join of the corpora. The oracle
    // replays sketches, pair union, both estimator passes, and the
    // clamped Jaccard.
    Q("sketch_hll_overlap",
      (s, dir) => graft.ops.Hll.overlap(
          Tables.documents(s, dir), "text", "source", p = 8)
        .orderBy("id_a", "id_b"),
      Some(s"""
        WITH $hllRegCte,
        est AS (${graft.ops.Hll.sqlEstimateFromRegs("regs", Seq("source"), 8)}),
        pairs AS (SELECT a.source AS id_a, b.source AS id_b
                  FROM est a JOIN est b ON a.source < b.source),
        u AS (SELECT p.id_a, p.id_b, r.bucket, max(r.max_rho) AS max_rho
              FROM pairs p JOIN regs r
                ON r.source = p.id_a OR r.source = p.id_b
              GROUP BY 1, 2, 3),
        est_u AS (${graft.ops.Hll.sqlEstimateFromRegs("u", Seq("id_a", "id_b"), 8)}),
        joined AS (SELECT eu.id_a, eu.id_b,
                     ea.est_distinct AS est_a, eb.est_distinct AS est_b,
                     eu.est_distinct AS est_union
                   FROM est_u eu
                   JOIN est ea ON ea.source = eu.id_a
                   JOIN est eb ON eb.source = eu.id_b),
        inter AS (SELECT *,
                    floor((est_a + est_b - est_union) * 1e4 + 0.5) / 1e4
                      AS est_intersect
                  FROM joined)
        SELECT id_a, id_b, est_a, est_b, est_union, est_intersect,
               ${Q.sqlDround("greatest(est_intersect, 0.0) / est_union", 6)}
                 AS est_jaccard
        FROM inter ORDER BY id_a, id_b""")),

    // 64-bit-hash HLL registers (§2 row 154 grown, r13): removes the
    // 32-bit lane's documented >100M-distinct/group ceiling — the
    // omitted large-range correction only matters past ~2³²/30; with a
    // 64-bit hash the analogous threshold sits past 10¹⁷. The hash rides
    // as two 32-bit BIGINT halves (bucket from the high half, the
    // 56-bit low word reassembled exactly) so the register table stays
    // verbatim-replayable — same md5-prefix fold, same integer ladder.
    Q("sketch_hll64",
      (s, dir) => graft.ops.Hll.registers64(
          Tables.documents(s, dir), "text", Seq("source"), p = 8)
        .orderBy("source", "bucket"),
      Some(s"""
        WITH $hllReg64Cte
        SELECT source, bucket, max_rho FROM regs64
        ORDER BY source, bucket""")),

    // 64-bit HLL estimate: harmonic sum in exact integer units of 2^-57 —
    // single terms fit BIGINT but the m-register sum can reach 2^65, so
    // it accumulates as DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both
    // exact; one final float divide + the linear-counting branch.
    Q("sketch_hll64_estimate",
      (s, dir) => graft.ops.Hll.estimate64(
          Tables.documents(s, dir), "text", Seq("source"), p = 8)
        .orderBy("source"),
      Some(s"""
        WITH $hllReg64Cte,
        est AS (${graft.ops.Hll.sqlEstimateFromRegs64("regs64", Seq("source"), 8)})
        SELECT source, n_nonzero, v_zero, est_distinct
        FROM est ORDER BY source""")),

    // Per-group OLS trend (§2 row 156): slope/intercept/R² of event
    // value against days-since-corpus-start — the drift-over-time
    // monitor. Exact-decimal moment sums, 2dp-rounded before the double
    // conversion (the decSum rule), closed-form fit on identical IEEE
    // operands; the oracle replays the whole fit.
    Q("events_trend",
      (s, dir) => graft.ops.Trend.ols(
          Tables.events(s, dir), "ts", "value", Seq("event_type"))
        .orderBy("event_type"),
      Some(s"""
        WITH ${graft.ops.Trend.sqlOls("events", "ts", "value", "event_type")}
        ORDER BY event_type""")),

    // Theil–Sen robust trend (§2 row 170 — Theil 1950, Sen 1968): the
    // breakdown-resistant complement of events_trend — median of all
    // pairwise daily slopes, O(span²) pairs bounded by the time window,
    // never the data; both medians selected by the cumulative-histogram
    // DISC rank rule (data values). Daily means, the pair join, and
    // both median selections replayed by the oracle. HASH-GREEN.
    Q("events_trend_theilsen",
      (s, dir) => graft.ops.Trend.theilSen(
          Tables.events(s, dir), "ts", "value", Seq("event_type"))
        .orderBy("event_type"),
      Some(s"""
        WITH ${graft.ops.Trend.sqlTheilSen("events", "ts", "value", "event_type")}
        ORDER BY event_type""")),

    // Mann–Kendall trend test (r13): the nonparametric IS-there-a-trend
    // companion of events_trend_theilsen's HOW-steep — S = Σ sign(Δ)
    // over all day pairs, tie-corrected variance, continuity-corrected
    // z; S and both variance numerators exact BIGINTs on 6dp-exact
    // daily means, only /18 and √ are float. Pairs are O(span²) —
    // bounded by the time window, never data volume.
    Q("events_mann_kendall",
      (s, dir) => graft.ops.Trend.mannKendall(
          Tables.events(s, dir), "ts", "value", Seq("event_type"))
        .orderBy("event_type"),
      Some(s"""
        WITH ${graft.ops.Trend.sqlMannKendall("events", "ts", "value", "event_type")}
        ORDER BY event_type""")),

    // Autocorrelation at lags 1-3 (r13): the persistence/seasonality
    // readout next to the trend tests — deviations from the series mean
    // (6dp exact), lag products 10dp-dround'd into exact DECIMAL(38,10)
    // sums, one final divide; missing days contribute no pair (the lag
    // join rides the day INDEX). Everything after the daily collapse is
    // span×3-bounded.
    Q("events_acf",
      (s, dir) => graft.ops.Trend.acf(
          Tables.events(s, dir), "ts", "value", Seq("event_type"), maxLag = 3)
        .orderBy("event_type", "lag"),
      Some(s"""
        WITH ${graft.ops.Trend.sqlAcf("events", "ts", "value", "event_type", 3)}
        ORDER BY event_type, lag""")),

    // Index of dispersion / Fano factor of daily event counts (r13):
    // the burstiness readout — ~1 for Poisson-like arrival, >>1 for
    // clumped feeds; daily counts exact longs, moments CAST to double
    // in a fixed IEEE chain. The "did this feed start arriving in
    // bursts" alarm next to the CUSUM level monitor.
    Q("events_dispersion",
      (s, dir) => graft.ops.Trend.dispersion(
          Tables.events(s, dir), "ts", Seq("event_type"))
        .orderBy("event_type"),
      Some(s"""
        WITH ${graft.ops.Trend.sqlDispersion("events", "ts", "event_type")}
        ORDER BY event_type"""))
  )

  /** The CDC fixture shared by cdc_apply and cdc_apply_persisted: the
    * orders snapshot plus a synthesized Debezium-shaped changelog in two
    * log-ordered batches — seq 1 carries updates (price doubled,
    * %10 = 0), deletes (%10 = 1) and shifted-key inserts (%10 = 2);
    * seq 2 is the delete overriding the %100 = 0 updates, so cross-batch
    * latest-wins is live. Returns (base, batch1, batch2). */
  private def cdcFixture(s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    def slice(m: Long, r: Long) = o.filter(col("o_orderkey") % m === r)
    val batch1 =
      slice(10, 0).select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          lit(1L).as("seq"), lit("U").as("op"))
      .unionByName(slice(10, 1).select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"),
        lit(1L).as("seq"), lit("D").as("op")))
      .unionByName(slice(10, 2).select(
        (col("o_orderkey") + 900000000L).as("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"),
        lit(1L).as("seq"), lit("I").as("op")))
    val batch2 = slice(100, 0).select(col("o_orderkey"),
      col("o_orderstatus"), col("o_totalprice"),
      lit(2L).as("seq"), lit("D").as("op"))
    (o, batch1, batch2)
  }

  /** The composed-batch ANSI mirror shared by cdc_apply (one-shot) and
    * cdc_apply_persisted (incremental) — final states are identical by
    * construction, so ONE oracle owns both. */
  private def cdcOracle: String = s"""
        WITH base AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        ch AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice,
                 1 AS seq, 'U' AS op FROM base WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice, 1, 'D'
          FROM base WHERE o_orderkey % 10 = 1
          UNION ALL
          SELECT o_orderkey, o_orderstatus, o_totalprice, 2, 'D'
          FROM base WHERE o_orderkey % 100 = 0
          UNION ALL
          SELECT o_orderkey + 900000000, o_orderstatus, o_totalprice, 1, 'I'
          FROM base WHERE o_orderkey % 10 = 2),
        latest AS (
          SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY o_orderkey
              ORDER BY seq DESC) AS rn FROM ch) WHERE rn = 1),
        surv AS (
          SELECT b.* FROM base b
          WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM latest)),
        ups AS (
          SELECT o_orderkey, o_orderstatus, o_totalprice FROM latest
          WHERE op <> 'D')
        SELECT o_orderkey, o_orderstatus,
               ${Q.sqlDround("CAST(o_totalprice AS DOUBLE)", 4)} AS price
        FROM (SELECT * FROM surv UNION ALL SELECT * FROM ups) t
        ORDER BY o_orderkey"""

  /** Shared DuckDB CTE ending in `regs(source, bucket, max_rho)` — the
    * p=8 HLL register build over document texts, single owner for both
    * sketch_hll queries. */
  private def hllRegCte: String = {
    val wBits = 24
    s"""pre AS (SELECT source, ${graft.ops.Hll.sqlH32("text")} AS h
          FROM documents WHERE text IS NOT NULL),
       rho AS (SELECT source, h // ${1L << wBits} AS bucket,
                 ${graft.ops.Hll.sqlRho(s"(h % ${1L << wBits})", wBits)} AS rho
               FROM pre),
       regs AS (SELECT source, bucket, max(rho) AS max_rho
                FROM rho GROUP BY 1, 2)"""
  }

  /** Shared DuckDB CTE ending in `regs64(source, bucket, max_rho)` — the
    * p=8 64-bit-hash register build, single owner for both sketch_hll64
    * queries. Bucket from the high 32-bit half; the 56-bit low word
    * reassembled as (hi mod 2^24)·2^32 + lo, exact BIGINTs throughout. */
  private def hllReg64Cte: String = {
    val wBits = 56
    val hiBits = 24
    s"""pre64 AS (SELECT source,
            ${graft.ops.Hll.sqlH64Hi("text")} AS hi,
            ${graft.ops.Hll.sqlH64Lo("text")} AS lo
          FROM documents WHERE text IS NOT NULL),
       w64 AS (SELECT source, hi // ${1L << hiBits} AS bucket,
                 (hi % ${1L << hiBits}) * ${1L << 32} + lo AS w
               FROM pre64),
       rho64 AS (SELECT source, bucket,
                   ${graft.ops.Hll.sqlRho("w", wBits)} AS rho
                 FROM w64),
       regs64 AS (SELECT source, bucket, max(rho) AS max_rho
                  FROM rho64 GROUP BY 1, 2)"""
  }
}
