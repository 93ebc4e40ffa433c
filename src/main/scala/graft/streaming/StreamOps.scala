package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Output row of [[StreamOps.runningUserTotals]]. */
final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)

/** Output row of [[StreamOps.streamingFunnel]]: emitted when a user first
  * reaches `step_idx` (0-based), with the event time that did it. */
final case class FunnelAdvance(user_id: Long, step_idx: Int, ts_us: Long)

/** Output row of [[StreamOps.streamingAnomaly]] — the streaming twin of
  * `EventAnalytics.rollingAnomaly`'s row. */
final case class AnomalyScore(user_id: Long, ts_us: Long, value: Double,
                              zscore: Option[Double], is_anomaly: Boolean)

/** Output row of [[StreamOps.streamingCusum]] — the streaming twin of
  * `Cusum.detect`'s row (key typed long here; the batch operator groups
  * by arbitrary columns). */
final case class CusumPoint(key: Long, ts_us: Long, tie: Long, value: Double,
                            cusum_up: Double, cusum_down: Double,
                            alarm: Boolean)

/** Output row of [[StreamOps.cdcLatest]] — the compacted-topic CDC
  * contract: one row per touched key per trigger with its resolved
  * latest state. */
final case class CdcLatestRow(key: Long, seq: Long, op: String,
                              payload: String)

/** Structured-Streaming-ready event transforms (SURVEY §2.2 row 42).
  * Every builder here works identically on a batch frame and a streaming
  * frame (`readStream` source): tumbling/session windows are the same
  * `window()`/`session_window()` calls, and the watermark hook makes the
  * aggregations state-bounded in continuous mode. Batch queries
  * (`events_window_agg`, `events_sessionize`) exercise the exact same
  * plans the stream would run.
  */
object StreamOps {

  /** Bound state for streaming aggregation; no-op on batch frames. */
  def withWatermark(df: DataFrame, tsCol: String, delay: String): DataFrame =
    if (df.isStreaming) df.withWatermark(tsCol, delay) else df

  /** Tumbling-window counts/sums per event type. */
  def windowedAgg(events: DataFrame, window_ : String = "1 hour",
                  delay: String = "2 hours"): DataFrame =
    withWatermark(events, "ts", delay)
      .groupBy(window(col("ts"), window_).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** How a stateful builder's `idleTimeout` is measured (`ttlMode`):
    *
    *  - `"processing"` — wall clock at the trigger
    *    (ProcessingTimeTimeout). Right for live traffic; WRONG under
    *    replay/backfill, where a fast-replayed historical stream covers
    *    days of event time in seconds of wall time and nothing expires
    *    (or, with slow replay, everything expires mid-stream).
    *  - `"event"` — stream time (EventTimeTimeout): a key expires when
    *    the WATERMARK passes its last event's time + `idleTimeout`. The
    *    replay-correct variant — expiry is a function of the data, so a
    *    backfill reproduces exactly the live run's expiry points. The
    *    input is watermarked on `tsCol` with `delay` (which also drops
    *    rows later than the watermark, the standard stateful-op
    *    contract).
    *
    * Engine notes: with ProcessingTimeTimeout Spark keeps scheduling
    * no-data batches to check expiry (`FlatMapGroupsWithStateExec
    * .shouldRunAnotherBatch` is unconditionally true for that conf), so
    * (a) pair it with an explicit processing-time trigger in production
    * or the micro-batch loop spins back-to-back, and (b)
    * `StreamingQuery.processAllAvailable()` never observes an idle stream
    * — await sink contents instead (see StreamingSpec.awaitUntil). With
    * EventTimeTimeout expiry only fires when the watermark ADVANCES —
    * i.e. when newer data arrives on some key; a fully idle stream
    * expires nothing (by design: stream time has not passed). On batch
    * frames timeouts never fire under either mode; the builders fold each
    * group exactly once. */
  val ProcessingTimeTtl = "processing"
  val EventTimeTtl = "event"

  private def eventMode(ttlMode: String): Boolean = ttlMode match {
    case ProcessingTimeTtl => false
    case EventTimeTtl => true
    case other => throw new IllegalArgumentException(
      s"ttlMode must be '$ProcessingTimeTtl' or '$EventTimeTtl', got '$other'")
  }

  private def timeoutConf(idleTimeout: Option[String],
                          event: Boolean): GroupStateTimeout =
    if (idleTimeout.isEmpty) GroupStateTimeout.NoTimeout
    else if (event) GroupStateTimeout.EventTimeTimeout
    else GroupStateTimeout.ProcessingTimeTimeout

  /** Arm the configured TTL after a group's state update. Event-time mode
    * anchors expiry at the max event time the group saw this trigger,
    * floored just above the current watermark (Spark rejects a timeout
    * timestamp at or below it — a group whose latest event is already
    * behind the watermark still gets a legal, soonest-possible expiry). */
  private def armTtl(state: org.apache.spark.sql.streaming.GroupState[_],
                     idleTimeout: Option[String], event: Boolean,
                     maxEventMs: Long): Unit =
    idleTimeout.foreach { d =>
      if (event) {
        val base = math.max(maxEventMs, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(base, d)
      } else state.setTimeoutDuration(d)
    }

  /** Custom keyed state via `flatMapGroupsWithState` — the escape hatch
    * for semantics `window()`/`session_window()` can't express. Emits the
    * running (count, total_value) per user, carried across triggers in
    * GroupState; on a batch frame the same code degenerates to a plain
    * per-group fold. State is per-key and O(1) per user — at 100 TB the
    * bound is #distinct users, so on an unbounded user-id space pass
    * `idleTimeout` (e.g. "30 minutes"): a key idle for that long has its
    * state EXPIRED (processing-time timeout, checked at each trigger) and
    * a later event restarts its totals from zero — boundedness traded for
    * forgetting idle keys, the standard production setting. No timeout
    * (default) keeps totals exact forever at O(#users) state.
    * `ttlMode = "event"` measures the idle window in STREAM time (see the
    * ttlMode doc above) — the replay/backfill-correct variant; it
    * watermarks `tsCol` with `delay` and anchors each key's expiry at its
    * last event's time. */
  def runningUserTotals(events: DataFrame,
                        idleTimeout: Option[String] = None,
                        ttlMode: String = ProcessingTimeTtl,
                        tsCol: String = "ts",
                        delay: String = "2 hours"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // Batch frames never time out under either mode; disarming the TTL on
    // the event-mode batch path also keeps the fold off the (streaming-
    // only) watermark accessor.
    val ev = eventMode(ttlMode) && idleTimeout.isDefined && events.isStreaming
    val ttl = if (eventMode(ttlMode) && !events.isStreaming) None else idleTimeout
    val src = if (ev) events.withWatermark(tsCol, delay) else events
    // Event-time TTL: the WATERMARKED COLUMN ITSELF must survive into the
    // state operator's input (Spark tracks the watermark via attribute
    // metadata, which any derived expression strips — projecting
    // `unix_millis(ts)` instead of `ts` fails analysis with "Event-time
    // timeout not supported without watermark"). So the raw timestamp
    // rides the tuple; rows without one still count toward the total but
    // not the TTL anchor.
    val tsRaw = if (ev) col(tsCol) else lit(null).cast("timestamp")
    // Event streams routinely carry null user_id/value rows; the (Long,
    // Double) tuple encoder would throw on them. Policy: an event with no
    // user or no value contributes to no user's running total — drop it.
    src.select(col("user_id").cast("long"), col("value").cast("double"),
        tsRaw.as("_gf_ts"))
      .na.drop(Seq("user_id", "value"))
      .as[(Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), UserRunning](
        OutputMode.Update, timeoutConf(ttl, ev)) {
        case (uid, it, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (n, total) = state.getOption.getOrElse((0L, 0.0))
            var maxMs = Long.MinValue
            it.foreach { case (_, v, t) =>
              n += 1; total += v
              if (t != null && t.getTime > maxMs) maxMs = t.getTime
            }
            state.update((n, total))
            armTtl(state, ttl, ev, maxMs)
            Iterator(UserRunning(uid, n, total))
          }
      }.toDF()
  }

  /** Streaming dedup: drop repeats of `keys` arriving within the watermark
    * delay of the first occurrence — the streaming twin of exact corpus
    * dedup (LlmDedup.exact) for at-least-once sources, where replays and
    * producer retries duplicate events. State is one entry per distinct
    * key, EXPIRED once the event-time watermark passes it
    * (`dropDuplicatesWithinWatermark`), so unlike a plain
    * `dropDuplicates` on a stream the state store does not grow without
    * bound. On a batch frame it degenerates to plain dropDuplicates. */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
                           tsCol: String = "ts",
                           delay: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Stream-static enrichment: equi-join each micro-batch against a static
    * dimension frame (the classic "decorate events with account/geo
    * attributes" step). The static side is marked broadcast — it is
    * re-resolved per micro-batch and never becomes stream state, so there
    * is no watermark requirement and no state store growth; left join
    * keeps events whose key has no dimension row yet (emitting null
    * attributes) rather than silently dropping them. On a batch frame it
    * is the same broadcast join. */
  def enrich(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Streaming curation gate: the engine's quality stack applied to a
    * LIVE document stream — continuous-ingestion curation. Every gate is
    * deliberately a stateless per-row projection, so the whole thing is
    * one `filter` with no watermark, no output-mode constraint, and no
    * state store: the composite quality score (fused kernel), the
    * stopword language classifier, the seven Gopher structural rules,
    * and — the one that NEEDS the design — the bigram-LM perplexity gate
    * via [[graft.text.LangModel.scoreBroadcast]]'s per-row kernel (the
    * join+aggregate LM routes would demand stateful streaming; the
    * shipped-model route doesn't). Unscoreable docs (no LM evidence)
    * fail the LM gate, the curation chain's convention. On a batch frame
    * the same call degenerates to the identical one-pass filter —
    * StreamingSpec pins stream ≡ batch on a real MemoryStream. */
  def curationGate(docs: DataFrame, textCol: String,
                   minQuality: Double, lang: String,
                   gopherCfg: graft.text.GopherRules.Config,
                   lm: graft.text.LangModel.Lm,
                   minLogprob: Double,
                   backoff: Double = 0.4,
                   maxTypes: Long = 20000000L): DataFrame = {
    require(minLogprob < 0,
      s"minLogprob=$minLogprob must be negative (avg conditioned " +
        "log-probability — a perplexity-style positive threshold would " +
        "drop the whole stream)")
    val t = col(textCol)
    // Shared guarded collect (LangModel.collectTables): an oversized LM
    // refuses with the join-route pointer instead of OOMing the driver —
    // the same bound scoreBroadcast enforces for this identical shape.
    val (uniN, biN) = graft.text.LangModel.collectTables(lm, maxTypes)
    val lmScore = graft.functions.LmScoreRow.lmScoreRow(
      t, uniN, biN, lm.total, backoff)("avg_logprob")
    docs.filter(
      graft.text.TextAnalysis.qualityScore(t) >= minQuality &&
        graft.text.TextAnalysis.languageId(t) === lang &&
        graft.text.GopherRules.keepFlag(t, gopherCfg) &&
        lmScore.isNotNull && lmScore >= minLogprob)
  }

  /** Streaming first-touch funnel: per-user state tracks the furthest
    * step reached (strict ordering — step i counts only STRICTLY AFTER
    * the time step i-1 was reached, same contract as the batch
    * `EventAnalytics.funnel`), carried across triggers in GroupState and
    * emitted as one [[FunnelAdvance]] row per newly-reached step.
    *
    * `flatMapGroupsWithState` rather than mapGroups: a single trigger can
    * advance a user through SEVERAL steps (0..k rows out per group per
    * trigger), which the 1-row-per-group contract can't express. State is
    * two numbers per user — (furthest step, its event time) — so the
    * store is O(#users) regardless of stream length; Append output mode
    * keeps every sink compatible. Events inside one trigger are sorted by
    * (ts, then type's step index) before the fold, so replays and INTRA-
    * trigger disorder converge to the same advances.
    *
    * Honest limit (unlike the stateless builders above, which really are
    * batch-identical): disorder ACROSS triggers diverges from batch — a
    * step-i event arriving in a later trigger than a step-i+1 event, or
    * an earlier-timestamped step-i event arriving after state pinned a
    * later one, is not retroactively applied (state keeps only the
    * furthest advance, there is no watermark-bounded reordering buffer).
    * That is the standard low-state streaming-funnel trade; run the
    * batch funnel over the archived log where exactness matters. On a
    * batch frame all events form one group, so the fold IS exact.
    * `idleTimeout` expires an idle user's progress — their next event
    * restarts the funnel at step 0; `ttlMode = "event"` measures the idle
    * window in stream time (watermarked on `ts` with `delay` — the
    * replay-correct variant, see the ttlMode doc above). */
  def streamingFunnel(events: DataFrame, steps: Seq[String],
                      idleTimeout: Option[String] = None,
                      ttlMode: String = ProcessingTimeTtl,
                      delay: String = "2 hours"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps — a repeated name would " +
        "map every occurrence to its last index and make earlier steps unreachable")
    val spark = events.sparkSession
    import spark.implicits._
    def advances(uid: Long, sorted: Seq[(Long, Int)],
                 from: (Int, Long)): (Seq[FunnelAdvance], (Int, Long)) = {
      var (reached, reachedTs) = from
      val out = Seq.newBuilder[FunnelAdvance]
      sorted.foreach { case (us, idx) =>
        if (idx == reached + 1 && (reached == -1 || us > reachedTs)) {
          reached = idx; reachedTs = us
          out += FunnelAdvance(uid, idx, us)
        }
      }
      (out.result(), (reached, reachedTs))
    }
    val ev = eventMode(ttlMode) && idleTimeout.isDefined && events.isStreaming
    val ttl = if (eventMode(ttlMode) && !events.isStreaming) None else idleTimeout
    val src = if (ev) events.withWatermark("ts", delay) else events
    // step name → index as a SQL map literal, not a typed .map: the
    // object round-trip would strip the watermark metadata the event-time
    // timeout needs (and cost a ser/deser pass besides); the raw `ts`
    // column rides the tuple for the same reason (see runningUserTotals).
    val stepMap = map(steps.zipWithIndex.flatMap {
      case (s0, i) => Seq(lit(s0), lit(i)) }: _*)
    val typed = src
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("event_type").isin(steps: _*))
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        element_at(stepMap, col("event_type")), col("ts"))
      .as[(Long, Long, Int, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Int, Long), FunnelAdvance](
        OutputMode.Append, timeoutConf(ttl, ev)) {
        case (uid, it, state) =>
          // An expired funnel forgets its progress: a user idle past
          // `idleTimeout` restarts at step 0 on their next event.
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = it.map { case (_, us, idx, _) => (us, idx) }.toSeq
              .sortBy(identity)
            val (rows, next) =
              advances(uid, sorted, state.getOption.getOrElse((-1, Long.MinValue)))
            state.update(next)
            armTtl(state, ttl, ev,
              if (sorted.isEmpty) Long.MinValue else sorted.last._1 / 1000L)
            rows.iterator
          }
      }.toDF()
  }

  /** Streaming CUSUM — the live twin of [[graft.drift.Cusum.detect]]:
    * per-key level-shift alarms on a stream, state being ONE (C⁺, C⁻)
    * pair per key in EXACT 1e-4 integer units (values ride the
    * ≤ 4-decimal contract, target/slack/threshold enforced
    * 4dp-representable), so the fold is pure Long arithmetic and a
    * streamed series produces BIT-IDENTICAL statistics to the batch
    * closed form — no float drift across triggers, executors, or
    * batch/stream replay. State is O(#keys) scalars, the smallest of
    * any stateful op here.
    *
    * Ordering: rows are folded in (event-time µs, tiebreak) order WITHIN
    * each trigger; cross-trigger reordering is the source's contract
    * (the streamingFunnel "strict order" posture). */
  def streamingCusum(events: DataFrame, target: Double, slack: Double,
                     threshold: Double,
                     tiebreakCol: Option[String] = None): DataFrame = {
    require(slack >= 0, s"slack must be >= 0, got $slack")
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    def toScaled(x: Double, name: String): Long = {
      val v = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      require(v.toDouble == x, s"$name must be 4dp-representable, got $x")
      (v * 10000).toLongExact
    }
    val tS = toScaled(target, "target")
    val kS = toScaled(slack, "slack")
    val hS = toScaled(threshold, "threshold")
    val spark = events.sparkSession
    import spark.implicits._
    val tb = tiebreakCol
      .map(c => coalesce(col(c).cast("long"), lit(Long.MinValue)))
      .getOrElse(lit(0L))
    val typed = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id").cast("long"), unix_micros(col("ts")), tb,
        // the scaled-long conversion happens ENGINE-side so the state
        // fold never sees a double
        round(col("value") * 10000).cast("long"))
      .as[(Long, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), CusumPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, it, state) =>
          var (up, dn) = state.getOption.getOrElse((0L, 0L))
          val out = it.map { case (_, us, tie, vS) => (us, tie, vS) }
            .toSeq.sortBy(identity)
            .map { case (us, tie, vS) =>
              up = math.max(0L, up + (vS - tS - kS))
              dn = math.max(0L, dn + (tS - kS - vS))
              CusumPoint(key, us, tie, vS / 1e4,
                up / 1e4, dn / 1e4, up > hS || dn > hS)
            }
          state.update((up, dn))
          out.iterator
      }.toDF()
  }

  /** Streaming rolling z-score anomaly — the live twin of
    * `EventAnalytics.rollingAnomaly`: each event scored against the
    * trailing `frame`-row mean/stddev of its key's series, state being a
    * ring of the last `frame - 1` values per user (O(frame · #users),
    * bounded regardless of stream length). Same z policy as the batch
    * operator: fewer than 2 trailing points or a constant frame → null z,
    * `is_anomaly` false.
    *
    * Intra-trigger events sort by (ts, tiebreak) before the fold (pass
    * the batch operator's `orderTiebreak` column via `tiebreakCol` to
    * reproduce its tie order; without one, same-ts ties break on value);
    * the same cross-trigger-disorder caveat as [[streamingFunnel]]
    * applies (a late event is scored against the state at arrival, not
    * re-slotted). On ordered input the FLAGS and 4-dp z agree with the
    * batch window up to double-vs-decimal accumulation in the last ulp
    * (z is rounded to 4 dp before the threshold test, exactly like the
    * batch operator — an unrounded test would flip boundary flags).
    * `idleTimeout` expires an idle key's ring; its next event restarts
    * cold (null z until the frame refills). `ttlMode = "event"` measures
    * the idle window in stream time (watermarked on `ts` with `delay` —
    * the replay-correct variant, see the ttlMode doc above). */
  def streamingAnomaly(events: DataFrame, frame: Int = 20,
                       threshold: Double = 3.0,
                       tiebreakCol: Option[String] = None,
                       idleTimeout: Option[String] = None,
                       ttlMode: String = ProcessingTimeTtl,
                       delay: String = "2 hours"): DataFrame = {
    require(frame >= 2, s"frame must be >= 2, got $frame")
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val spark = events.sparkSession
    import spark.implicits._
    // null tiebreaks sort first (Spark's ascending NULLS FIRST, like the
    // batch window) instead of crashing the non-nullable tuple encoder
    val tb = tiebreakCol
      .map(c => coalesce(col(c).cast("long"), lit(Long.MinValue)))
      .getOrElse(lit(0L))
    val ev = eventMode(ttlMode) && idleTimeout.isDefined && events.isStreaming
    val ttl = if (eventMode(ttlMode) && !events.isStreaming) None else idleTimeout
    val src = if (ev) events.withWatermark("ts", delay) else events
    // raw `ts` rides the tuple: the event-time timeout needs the
    // watermarked column itself in the state operator's input (see
    // runningUserTotals)
    val typed = src
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id").cast("long"), unix_micros(col("ts")), tb,
        col("value").cast("double"), col("ts"))
      .as[(Long, Long, Long, Double, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[Vector[Double], AnomalyScore](
        OutputMode.Append, timeoutConf(ttl, ev)) {
        case (uid, it, state) =>
          // An expired ring restarts cold: the next event scores as if the
          // key's series just began (null z until the frame refills).
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var ring = state.getOption.getOrElse(Vector.empty[Double])
          val sorted = it.map { case (_, us, t, v, _) => (us, t, v) }.toSeq
            .sortBy(identity)
          val out = sorted
            .map { case (us, _, v) =>
              val win = ring :+ v // trailing frame INCLUDING current
              val n = win.size
              val z =
                if (n < 2) None
                else {
                  val mean = win.sum / n
                  val varS = win.map(x => (x - mean) * (x - mean)).sum / (n - 1)
                  // 4-dp round BEFORE the threshold test — the batch
                  // operator's dround discipline; raw-z flags would
                  // disagree at the boundary
                  if (varS > 0)
                    Some(math.floor((v - mean) / math.sqrt(varS) * 1e4 + 0.5) / 1e4)
                  else None
                }
              ring = win.takeRight(frame - 1)
              AnomalyScore(uid, us, v, z, z.exists(math.abs(_) > threshold))
            }
          state.update(ring)
          armTtl(state, ttl, ev,
            if (sorted.isEmpty) Long.MinValue else sorted.last._1 / 1000L)
          out.iterator
          }
      }.toDF()
  }

  /** Stream-stream interval join: each left event matched to right events
    * for the same `keys` whose timestamp falls in
    * `[leftTs - before, leftTs + after]` — impression↔click attribution,
    * request↔response pairing, sensor correlation.
    *
    * Both sides MUST be watermarked and the join condition MUST bound the
    * two event-time columns against each other — that pair of constraints
    * is what lets Spark expire buffered rows: each side's state store
    * holds only rows inside `watermark + interval`, so state is bounded
    * by rate × window, not by stream length. An unbounded stream-stream
    * equi-join (no time bound) would buffer both streams forever; this
    * builder makes the bounded form the only expressible one.
    *
    * `joinType`: "inner" (default) drops unmatched rows; "leftOuter"
    * emits each unmatched LEFT row null-padded once its match window can
    * no longer fill — i.e. when the watermark passes `leftTs + after` —
    * the attribution "impression with no click" row. On batch frames the
    * same predicate runs as an ordinary (left/inner) range join.
    *
    * Output naming: left columns keep their names; the right side's join
    * keys are DROPPED (equal to the left's on matched rows, null on
    * outer-unmatched ones) and any remaining right column whose name
    * collides with a left column comes back prefixed `r_` — every output
    * column is selectable by name, no AMBIGUOUS_REFERENCE. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String = "ts", rightTs: String = "ts",
                   before: String = "10 minutes", after: String = "10 minutes",
                   delay: String = "2 hours",
                   joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one equi-key")
    val jt = joinType match {
      case "inner" => "inner"
      case "leftOuter" | "left_outer" | "left" => "left_outer"
      case other => throw new IllegalArgumentException(
        s"intervalJoin supports inner and leftOuter, got '$other'")
    }
    val l = withWatermark(left, leftTs, delay).alias("l")
    val r = withWatermark(right, rightTs, delay).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond =
      col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $before") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $after")
    val joined = l.join(r, keyCond && timeCond, jt)
    val leftNames = left.columns.toSet
    val outCols = left.columns.toSeq.map(c => col(s"l.$c")) ++
      right.columns.toSeq.filterNot(keys.contains).map { c =>
        if (leftNames.contains(c)) col(s"r.$c").as(s"r_$c") else col(s"r.$c")
      }
    joined.select(outCols: _*)
  }

  /** Live CDC state maintenance — the streaming twin of
    * [[graft.ops.Cdc.applyChanges]]'s latest-wins resolution: a
    * Debezium-shaped changelog stream folds into per-key state (the
    * winning sequence number + op + payload), and each trigger emits one
    * row per TOUCHED key with its post-trigger resolved state — the
    * compacted-topic contract (key, seq, op, payload_json); a downstream
    * sink materializes the snapshot by latest-per-key compaction over
    * the base, exactly as [[graft.ops.Cdc]]'s batch anti-join does.
    *
    * Payload rides as engine-rendered JSON (`to_json` of every non-meta
    * column), so the state per key is O(row width) and the operator needs
    * no payload-specific encoder; `from_json` with the base schema
    * restores typed columns losslessly (Spark renders doubles in
    * shortest-round-trip form).
    *
    * Semantics, matching the batch/persisted lanes' discipline:
    *  - within and across triggers the HIGHEST sequence wins;
    *  - a change at a sequence the key has already applied or passed is
    *    DROPPED silently (the per-key granular form of the persisted
    *    lane's monotone-batch guard: replays and stale late arrivals
    *    must not regress state) — UNLESS it replays the currently-applied
    *    sequence with a DIFFERENT op/payload, which means the log
    *    disagrees with itself at one (key, seq) and the query FAILS,
    *    restoring parity with the batch lane's duplicate refusal
    *    ([[graft.ops.Cdc.applyChanges]]); an identical replay stays
    *    suppressed, as at-least-once delivery requires;
    *  - two changes at one (key, seq) inside a trigger have no defined
    *    winner → the query FAILS (the streaming analogue of
    *    applyChanges' duplicate refusal — a poisoned log should stop the
    *    pipeline, not corrupt the snapshot);
    *  - unknown ops fail likewise.
    *
    * On a BATCH frame the same operator runs with empty initial state in
    * one pass, so it degenerates to exactly applyChanges' latest CTE —
    * the `cdc_apply_streamed` registry key composes it with the base
    * anti-join and shares cdc_apply's oracle verbatim.
    *
    * State per key is one (long, string, json) triple — bounded by key
    * cardinality, the same bound any compacted CDC topic already pays. */
  def cdcLatest(changes: DataFrame, keyCol: String, seqCol: String,
                opCol: String): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    val payload = changes.columns.toSeq.filterNot(c => c == seqCol || c == opCol)
    val typed = changes.select(col(keyCol).cast("long"),
        col(seqCol).cast("long"), col(opCol).cast("string"),
        to_json(struct(payload.map(col): _*)))
      .as[(Long, Long, String, String)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String, String), CdcLatestRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, it, state) =>
          var cur = state.getOption // (seq, op, payload)
          val batch = it.toSeq
          val bySeq = batch.groupBy(_._2).filter(_._2.size > 1)
          if (bySeq.nonEmpty) throw new IllegalStateException(
            s"changelog has two changes at (key=$key, seq=${bySeq.keys.head})" +
              " — no defined winner; fix the log")
          val before = cur.map(_._1)
          batch.sortBy(_._2).foreach { case (_, seq, op, pl) =>
            if (!graft.ops.Cdc.Ops.contains(op)) throw new IllegalStateException(
              s"changelog carries op '$op' at key=$key — ops must be one of " +
                graft.ops.Cdc.Ops.mkString(", "))
            if (cur.forall(_._1 < seq)) cur = Some((seq, op, pl))
            else cur.filter(_._1 == seq).foreach { case (_, cop, cpl) =>
              // replay at the APPLIED sequence: identical → suppress
              // (at-least-once replays are normal); divergent → the log
              // contradicts itself at one (key, seq) — poisoned, refuse,
              // matching applyChanges' batch duplicate refusal
              if (cop != op || cpl != pl) throw new IllegalStateException(
                s"changelog replays (key=$key, seq=$seq) with a different " +
                  s"op/payload than was applied ('$cop' vs '$op') — " +
                  "divergent replay; fix the log")
            }
          }
          cur match {
            // emit only when this trigger ADVANCED the key — a
            // stale-replay-only trigger re-emitting unchanged state would
            // duplicate rows in the compacted sink
            case Some((seq, op, pl)) if !before.contains(seq) =>
              state.update((seq, op, pl))
              Iterator.single(CdcLatestRow(key, seq, op, pl))
            case _ => Iterator.empty
          }
      }.toDF()
  }

  /** Gap-based sessionization per user: session_window keeps a session
    * open while events arrive within `gap` of the previous one. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 delay: String = "2 hours"): DataFrame =
    withWatermark(events, "ts", delay)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
}
