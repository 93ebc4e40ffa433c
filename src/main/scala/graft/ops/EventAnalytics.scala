package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Sequential event analytics over an (user, ts, type) stream — funnel
  * conversion and cohort retention, the two queries every product/events
  * warehouse runs daily (SURVEY §2.2 family, alongside sessionize).
  *
  * Both operators work on the µs-integer timestamp (`unix_micros`) so the
  * ordering matches any external engine reading the same data at µs
  * granularity, and both reduce to per-user aggregates joined on the user
  * key — each stage shuffles only (user, ts) pairs or smaller, co-keyed on
  * the same column, so a 100 TB event log flows through S user-keyed
  * aggregations for an S-step funnel with no row-level cross join and
  * no global sort. */
object EventAnalytics {

  private def us(tsCol: String): Column = unix_micros(col(tsCol))

  /** Ordered funnel: for each step i, a user qualifies if they performed
    * `steps(i)` STRICTLY AFTER their qualifying time for step i-1 (classic
    * first-touch funnel). Emits one row per step:
    * (step_idx, step, n_users, pct_of_first) — pct at 4dp. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), us(tsCol).as("t"), col(typeCol).as("ty"))
    // stage frames: (u, t_i) = earliest qualifying time per user
    val stages = steps.zipWithIndex.tail.scanLeft(
      e.filter(col("ty") === steps.head).groupBy("u").agg(min("t").as("t"))
    ) { case (prev, (step, _)) =>
      e.filter(col("ty") === step)
        .join(prev.select(col("u"), col("t").as("tp")), "u")
        .filter(col("t") > col("tp"))
        .groupBy("u").agg(min("t").as("t"))
    }
    val counts = stages.zip(steps.zipWithIndex).map { case (df, (step, i)) =>
      df.agg(count(lit(1)).cast(LongType).as("n_users"))
        .select(lit(i).as("step_idx"), lit(step).as("step"), col("n_users"))
    }
    val w = Window.orderBy("step_idx")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts.reduce(_.unionByName(_))
      .withColumn("pct_of_first",
        graft.Num.dround(
          when(first("n_users").over(w) > 0,
            col("n_users").cast(DoubleType) /
              first("n_users").over(w).cast(DoubleType)), 4))
      .orderBy("step_idx")
  }

  /** Cohort retention at day granularity: users grouped by the epoch-day
    * of their FIRST event, counted distinct on each later active day.
    * (cohort_day, day_offset, n_users, retention_pct) — pct relative to
    * the cohort's day-0 count. Day index = trunc(µs / 86 400 000 000):
    * the double quotient of a µs integer sits ≥3 ulps away from the next
    * whole day unless it IS an exact midnight (which divides exactly), so
    * the truncation agrees with integer division in any engine. */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        (us(tsCol) / lit(86400000000L)).cast(LongType).as("d"))
    val active = e.distinct()
    val firstDay = active.groupBy("u").agg(min("d").as("cohort_day"))
    val counts = active.join(firstDay, "u")
      .groupBy(col("cohort_day"), (col("d") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).cast(LongType).as("n_users")) // distinct by construction
    val w = Window.partitionBy("cohort_day").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    counts
      .withColumn("retention_pct",
        graft.Num.dround(
          when(col("day_offset") === 0, lit(1.0)).otherwise(
            col("n_users").cast(DoubleType) /
              first("n_users").over(w).cast(DoubleType)), 4))
      .orderBy("cohort_day", "day_offset")
  }

  /** Rolling z-score anomaly detection: each event scored against the
    * trailing `frame`-row mean/stddev of its OWN key's series — metric
    * spike detection over sensor/billing/traffic streams.
    *
    * Parity shape (see events_rolling): mean and variance derive from
    * DECIMAL power sums over the frame (sum v, sum v²) so the rolling
    * reduction is order-independent and bit-identical in any engine;
    * sample variance via (Σv² − (Σv)²/n)/(n−1), negatives from decimal
    * round-off clamped at 0. Rows with fewer than 2 trailing points or a
    * degenerate (constant) frame get z = null, anomaly = false.
    *
    * DOMAIN: |value| < 1e12 — the square's (18,6) operand cap (a wider
    * operand would push the (37,12) product past the 38-digit decimal
    * ceiling in both engines). Out-of-range values FAIL LOUDLY: under the
    * session's default ANSI mode the cast itself throws, and with ANSI
    * off a guard raises rather than letting the nulled square silently
    * drop out of Σv² while the row still counts in n and Σv (a quietly
    * wrong variance — the failure mode requireIntegralKey exists to
    * prevent elsewhere).
    *
    * Scale shape: ONE window shuffle on the series key (both frames share
    * the same (partition, order) spec so Catalyst plans a single Window
    * node); no joins, no global sort until the caller asks for one. */
  /** Kaplan–Meier survival over user lifetimes (Kaplan & Meier 1958) —
    * the censoring-honest upgrade of [[retention]]: per user the
    * lifetime t = last-active day − first-active day; users still
    * active in the final `censorDays` of the observation window are
    * CENSORED at t (treating them as churned is the classic downward
    * bias this estimator exists to remove). At each distinct lifetime:
    * d_t churn events, c_t censorings, n_t = users with lifetime ≥ t at
    * risk, and Ŝ(t) = Π_{u ≤ t} (1 − d_u/n_u).
    *
    * Cross-engine exactness: each factor drounds to 6dp; the product
    * folds LEFT over the ascending-lifetime list on BOTH engines
    * (Spark: `aggregate` over an ordered window collect; DuckDB:
    * `list_reduce` over an ordered window list) — the multiplication
    * ORDER is pinned, so the IEEE chain is identical; the prefix frame
    * is lifetime-distinct (≤ observation-span rows), so the quadratic
    * window is bounded by TIME, never data.
    *
    * Output: (t_day, n_risk, n_events, n_censored, survival), one row
    * per distinct lifetime.
    *
    * 100 TB: the corpus collapses to one row per user in a map-side-
    * combined aggregation; everything after runs on span-bounded frames. */
  def survival(events: DataFrame, userCol: String, tsCol: String,
               censorDays: Int = 7): DataFrame = {
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val e = events
      .where(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(graft.Num.longKey(col(userCol), userCol).as("_u"),
        (us(tsCol) / lit(86400000000L)).cast(LongType).as("_d"))
    val horizon = e.agg(max("_d").as("_hmax"))
    val per = e.groupBy("_u")
      .agg(min("_d").as("_d0"), max("_d").as("_d1"))
      .crossJoin(broadcast(horizon))
      .select(col("_u"), (col("_d1") - col("_d0")).as("t_day"),
        (col("_d1") > col("_hmax") - censorDays).as("_cens"))
    val km = per.groupBy("t_day").agg(
      sum(when(!col("_cens"), 1L).otherwise(0L)).as("n_events"),
      sum(when(col("_cens"), 1L).otherwise(0L)).as("n_censored"))
    val back = Window.orderBy(col("t_day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = km.withColumn("n_risk",
      sum(col("n_events") + col("n_censored")).over(back))
    val factor = graft.Num.dround(
      lit(1.0) - col("n_events").cast("double") / col("n_risk").cast("double"), 6)
    val fwd = Window.orderBy(col("t_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withRisk
      .withColumn("_f", factor)
      .withColumn("_fs", collect_list(col("_f")).over(fwd))
      .select(col("t_day"), col("n_risk"), col("n_events"), col("n_censored"),
        graft.Num.dround(
          aggregate(col("_fs"), lit(1.0), (acc, x) => acc * x), 6)
          .as("survival"))
  }

  def rollingAnomaly(events: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, orderTiebreak: String,
                     frame: Int = 20, threshold: Double = 3.0): DataFrame = {
    require(frame >= 2, s"frame must be >= 2, got $frame")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    import org.apache.spark.sql.types.DecimalType
    val ord = Seq(us(tsCol), col(orderTiebreak))
    val w = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(-(frame - 1), 0)
    // (30,6) for the linear sum; the square uses (18,6) so the product is
    // (37,12) — inside the 38-digit cap in BOTH engines (a (30,6) square
    // would overflow DuckDB and silently rescale in Spark)
    val dec = col(valueCol).cast(DecimalType(30, 6))
    // ANSI mode throws on the overflowing cast itself; the when-guard
    // covers ANSI-off sessions, where the cast would null and the square
    // would silently vanish from s2 while the row still counts in n/s1
    val dec18 = when(
      col(valueCol).isNotNull && col(valueCol).cast(DecimalType(18, 6)).isNull,
      raise_error(concat(lit(s"rollingAnomaly: |$valueCol| >= 1e12 exceeds the " +
        "decimal(18,6) square operand domain, got "), col(valueCol).cast("string"))))
      .otherwise(col(valueCol).cast(DecimalType(18, 6)))
    val n = count(col(valueCol)).over(w)
    val s1 = sum(dec).over(w).cast(DoubleType)
    val s2 = sum(dec18 * dec18).over(w).cast(DoubleType)
    val mean = s1 / n
    val variance = greatest(
      (s2 - s1 * s1 / n) / (n - lit(1)), lit(0.0))
    val z = (col(valueCol).cast(DoubleType) - mean) / sqrt(variance)
    events
      // ts is the frame's ordering key: a null ts would anchor NULLS
      // FIRST here but NULLS LAST in engines with the other default,
      // silently shifting every early frame — exclude it like the key
      .filter(col(keyCol).isNotNull && col(valueCol).isNotNull &&
        col(tsCol).isNotNull)
      .select(col(keyCol), col(orderTiebreak), col(valueCol),
        when(n >= 2 && variance > 0, graft.Num.dround(z, 4)).as("zscore"))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) > threshold, lit(false)))
  }
  /** Fixed-grid resample with zero-filled gaps: per-bucket event and
    * distinct-entity counts over a COMPLETE `unit` grid from the frame's
    * first to last bucket — the step a dashboard or anomaly monitor
    * needs before any rolling window (a missing bucket is an outage
    * signal, not an absent row; rolling stats over a gappy frame
    * silently shrink their denominators).
    *
    * Scale shape: one map-side-combined grouped aggregation over the
    * events; the grid is TIME-bounded, not data-bounded (hours in the
    * observed span), generated from a 1-row bounds aggregate and
    * broadcast-joined against the bucket counts — nothing row-sized
    * moves after the first aggregation. Buckets emit as unix micros
    * (the events family convention — timestamps never cross the oracle
    * hash boundary). */
  def resample(df: DataFrame, tsCol: String, unit: String,
               userCol: Option[String] = None): DataFrame = {
    val allowed = Set("hour", "day", "week", "month")
    require(allowed.contains(unit),
      s"resample unit must be one of ${allowed.mkString(", ")}, got '$unit'")
    val t = col(tsCol)
    val clean = df.filter(t.isNotNull)
    val bounds = clean.agg(
      date_trunc(unit, min(t)).as("_gf_lo"),
      date_trunc(unit, max(t)).as("_gf_hi"))
    val step = unit match {
      case "hour"  => expr("interval 1 hour")
      case "day"   => expr("interval 1 day")
      case "week"  => expr("interval 7 days")
      case "month" => expr("interval 1 month")
    }
    val grid = bounds
      .select(explode(sequence(col("_gf_lo"), col("_gf_hi"), step)).as("_gf_bucket"))
    val aggs = Seq(count(lit(1)).as("n_events")) ++
      userCol.map(u => countDistinct(col(u)).as("n_users"))
    val counts = clean
      .groupBy(date_trunc(unit, t).as("_gf_bucket"))
      .agg(aggs.head, aggs.tail: _*)
    val joined = grid.join(broadcast(counts), Seq("_gf_bucket"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
    val filled = userCol.fold(joined)(_ =>
      joined.withColumn("n_users", coalesce(col("n_users"), lit(0L))))
    filled
      .select(Seq(unix_micros(col("_gf_bucket")).as(s"${unit}_us"),
        col("n_events")) ++ userCol.map(_ => col("n_users")): _*)
      .orderBy(s"${unit}_us")
  }

  /** SCD2 validity intervals from an event stream — the change-history
    * builder every warehouse keeps next to its `latest` snapshot
    * ([[graft.queries.OpsQueries]] `events_latest`): per entity, each
    * CHANGE of `stateCol` opens a version row [valid_from, valid_to),
    * half-open on the next change's timestamp; the open interval
    * (valid_to null) is the current state. Consecutive equal states
    * collapse into one interval — re-observing the same state is not a
    * change (classic type-2 dimension semantics).
    *
    * Deterministic under ties: ordering is (ts, tieCol) — a total order,
    * so two runs of any partitioning emit the SAME history; null
    * entity/ts/state rows are dropped (they can anchor no interval).
    * Timestamps emit as epoch-µs integers (the engine's cross-engine
    * timestamp convention).
    *
    * Scale shape: both windows share ONE partitioning on the entity key
    * — a single shuffle, no global sort; the change filter drops
    * unchanged rows BEFORE the second (version-numbering) window, so the
    * heavier window runs over changes only, which for real dimension
    * feeds is a tiny fraction of observations. */
  def history(events: DataFrame, entityCol: String, tsCol: String,
              stateCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    val changes = events
      .filter(col(entityCol).isNotNull && col(tsCol).isNotNull &&
        col(stateCol).isNotNull)
      .withColumn("_gf_prev", lag(col(stateCol), 1).over(w))
      .filter(col("_gf_prev").isNull || col("_gf_prev") =!= col(stateCol))
    val w2 = Window.partitionBy(entityCol).orderBy(col(tsCol), col(tieCol))
    changes
      .select(col(entityCol),
        row_number().over(w2).cast("int").as("version"),
        col(stateCol).as("state"),
        unix_micros(col(tsCol)).as("valid_from_us"),
        unix_micros(lead(col(tsCol), 1).over(w2)).as("valid_to_us"))
      .withColumn("is_current", col("valid_to_us").isNull)
  }

  /** Seasonal profile + seasonality strength (one-way variance
    * decomposition): per (group, hour-of-day) the exact-decimal mean,
    * plus the group's seasonality R² = SS_between / SS_total — the
    * fraction of the metric's variance the daily cycle explains (≈ 0:
    * the hour profile is noise, don't seasonally adjust; ≈ 1: the series
    * IS its daily shape, compare like hours to like). The time-bucketed
    * counterpart of grouped describe, and the calibration step before
    * any seasonality-adjusted anomaly rule.
    *
    * Cross-engine exactness: the hour bucket is pure integer µs
    * arithmetic ((epoch_us div 3 600 000 000) mod 24 — engine date
    * functions and their timezone semantics never enter); values ride
    * the ≤ 4-decimal contract so Σx and Σx² are exact decimals; means
    * are one IEEE divide; the 24-term variance sums re-enter exact
    * decimals via the dround-then-cast rule before summing (a plain
    * double sum over buckets is reduction-order-dependent).
    *
    * Scale: ONE map-side-combined aggregation to groups×24 rows; the
    * decomposition is arithmetic over that tiny frame. */
  def seasonalProfile(df: DataFrame, tsCol: String, valueCol: String,
                      groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val gs = groupCols.map(col)
    val usPerHour = 3600000000L
    val base = df.where(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(gs :+
        expr(s"(unix_micros(`$tsCol`) div $usPerHour) % 24").as("hour_of_day") :+
        col(valueCol).cast(DecimalType(18, 4)).as("_v"): _*)
    val perBucket = base.groupBy(gs :+ col("hour_of_day"): _*)
      .agg(count(lit(1)).as("n"),
        sum("_v").as("_s"),
        sum(col("_v") * col("_v")).as("_s2"))
      .withColumn("mean_value",
        graft.Num.dround(
          round(col("_s"), 2).cast("double") / col("n"), 4))
    // group totals from the SAME bucket sums (one scan total)
    val totals = perBucket.groupBy(gs: _*)
      .agg(sum("n").as("_tn"), sum("_s").as("_ts"), sum("_s2").as("_ts2"),
        // SS_between re-enters exact decimals per bucket term (dround
        // BEFORE the decimal cast — the dsum tie-free discipline)
        sum(graft.Num.dround(
          col("n") * graft.Num.dround(
            (round(col("_s"), 2).cast("double") / col("n")) *
              (round(col("_s"), 2).cast("double") / col("n")), 4), 4)
          .cast(DecimalType(30, 4))).as("_ssb_raw"))
      .select(gs :+ col("_tn") :+
        graft.Num.dround(round(col("_ts"), 2).cast("double") / col("_tn"), 6)
          .as("_gmean") :+
        round(col("_ts2"), 2).cast("double").as("_ts2d") :+
        round(col("_ssb_raw"), 2).cast("double").as("_ssbd"): _*)
    val sst = col("_ts2d") - col("_tn").cast("double") * col("_gmean") * col("_gmean")
    val ssb = col("_ssbd") - col("_tn").cast("double") * col("_gmean") * col("_gmean")
    val strength = totals.select(gs :+
      when(sst > 0, graft.Num.dround(ssb / sst, 6)).as("seasonality_r2"): _*)
    perBucket
      .select(gs :+ col("hour_of_day") :+ col("n") :+ col("mean_value"): _*)
      .join(broadcast(strength), groupCols)
  }
}
