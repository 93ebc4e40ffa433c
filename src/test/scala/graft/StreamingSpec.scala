package graft

import graft.streaming.StreamOps
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Proves the StreamOps builders run as REAL Structured Streaming queries
  * (readStream source, watermark, stateful window aggregation, memory
  * sink) and produce the same results as the identical batch plan — the
  * "works identically on batch and stream" claim, executed, not asserted.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val rows = Seq(
    (ts(0), "click", 1.0, 1L), (ts(5), "click", 2.0, 1L),
    (ts(10), "view", 3.0, 2L), (ts(59), "click", 4.0, 2L))

  test("windowedAgg runs as a streaming query and matches the batch result") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
    assert(streamDf.isStreaming)

    val q = StreamOps.windowedAgg(streamDf, "30 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_agg")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = StreamOps.windowedAgg(
      rows.toDF("ts", "event_type", "value", "user_id"), "30 minutes", "1 hour")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed == batch)
    assert(batch.map(_.getAs[Long]("n")).sum == 4)
  }

  test("probePairs flags streaming near-dups against a static stored signature index") {
    implicit val sqlCtx = spark.sqlContext
    import graft.dedup.MinHash
    val baseText = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearText = (1 to 48).map(i => s"tok$i").mkString(" ") // truncated 80%
    val novelText = (200 to 260).map(i => s"z$i").mkString(" ")
    // "yesterday's corpus": signatures persisted once, probed without text
    // (doc 11 is unrelated to every probe — tokenization lowercases, so a
    // case change would NOT make texts distinct)
    val otherText = (500 to 560).map(i => s"w$i").mkString(" ")
    val index = MinHash.signatures(
      Seq((10L, baseText), (11L, otherText)).toDF("doc_id", "text"),
      "text", "doc_id", n = 3, k = 64)
      .localCheckpoint(true) // stands in for the parquet-stored index

    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF.toDF("doc_id", "text")
    val q = MinHash.probePairs(streamDf, index, "text", "doc_id",
        n = 3, k = 64, bands = 16, threshold = 0.5)
      .writeStream.format("memory").queryName("probe_pairs")
      .outputMode("append").start()
    mem.addData((100L, nearText), (101L, novelText))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("probe_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the truncated clone matches its indexed original (possibly once per
    // colliding band — the documented streaming duplicate semantics)...
    val hits = out.filter(p => p._1 == 100L && p._2 == 10L)
    assert(hits.nonEmpty, s"near-dup not flagged: ${out.toSeq}")
    assert(hits.forall(_._3 >= 0.5))
    // ...and the novel doc matches nothing (case differs from doc 11)
    assert(!out.exists(_._1 == 101L), s"novel doc wrongly flagged: ${out.toSeq}")

    // batch degeneration: same call on a batch frame, distinct exact pairs
    val batch = MinHash.probePairs(
      Seq((100L, nearText), (101L, novelText)).toDF("doc_id", "text"),
      index, "text", "doc_id", n = 3, k = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(batch.toSeq == Seq((100L, 10L)))
    // streaming emissions are the batch pair set up to band multiplicity
    assert(out.map(p => (p._1, p._2)).distinct.toSeq == batch.toSeq)
  }

  test("curationGate filters a live stream and matches the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    import graft.text.{GopherRules, LangModel}
    val goodText =
      "the quick brown fox and the lazy dog have to run with care that day"
    val lm = LangModel.train(
      Seq(Tuple1(goodText), Tuple1(goodText + " again")).toDF("text"), "text")
    val cfg = GopherRules.Config(minWords = 5, minStopHits = 1)
    val docs = Seq(
      1L -> goodText,                                       // passes all
      2L -> "qqq www eee rrr ttt yyy uuu the and of it",    // LM: OOV floor
      3L -> "too few",                                      // gopher words
      4L -> "der die das und ist ein nicht mit oder auch",  // language
      5L -> "")                                             // blank: no evidence
    def gate(df: org.apache.spark.sql.DataFrame) =
      StreamOps.curationGate(df, "text", minQuality = 0.0, lang = "en",
        cfg, lm, minLogprob = -2.0)

    val mem = MemoryStream[(Long, String)]
    val q = gate(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curation_gate")
      .outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curation_gate").collect()
      .map(_.getLong(0)).toSet
    assert(streamed == Set(1L), s"stream gate kept: $streamed")

    // batch degeneration: the SAME call on a batch frame, same verdicts
    val batch = gate(docs.toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(batch == streamed)

    // the perplexity-sign typo refuses up front
    intercept[IllegalArgumentException] {
      StreamOps.curationGate(docs.toDF("doc_id", "text"), "text",
        0.0, "en", cfg, lm, minLogprob = 2.0)
    }
    // an LM too large to ship in-memory refuses with the join-route
    // pointer (the shared LangModel.collectTables guard) instead of
    // collecting unbounded tables into the driver
    val tooBig = intercept[IllegalArgumentException] {
      StreamOps.curationGate(docs.toDF("doc_id", "text"), "text",
        0.0, "en", cfg, lm, minLogprob = -2.0, maxTypes = 1)
    }
    assert(tooBig.getMessage.contains("hashKeys"))
    lm.release()
  }

  test("fastText kernel gate runs unchanged on a live stream (stream == batch)") {
    implicit val sqlCtx = spark.sqlContext
    // The FtScoreRow projection is stateless — no watermark, no state
    // store — so a score threshold gates a stream exactly like a batch.
    val w = Seq(("good", 2.0), ("bad", -2.0)).toDF("feature", "weight")
    val docs = Seq(
      1L -> "good clean prose",   // above threshold
      2L -> "bad junk noise",     // below
      3L -> "")                   // blank: null score, never passes
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.text.FastText.scoreBroadcast(df, "doc_id", "text", w, bias = 0.0)
        .filter(col("score") >= 0.5)

    val mem = MemoryStream[(Long, String)]
    val q = gate(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ft_gate")
      .outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ft_gate").collect().map(_.getLong(0)).toSet
    assert(streamed == Set(1L), s"stream ft gate kept: $streamed")
    val batch = gate(docs.toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(batch == streamed)
  }

  test("Count-Min sketch accumulates on a live stream and equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    // The sketch IS an aggregation (groupBy row/cell + sum), so it runs
    // under output mode COMPLETE with d·w-bounded state — the streaming
    // frequency monitor shape (per-trigger snapshot of all counters).
    val keys = Seq(3L, 3L, 3L, 7L, 7L, 11L, 3L, 11L, 11L, 11L)
    val mem = MemoryStream[Long]
    val q = graft.ops.CountMin.sketch(mem.toDF.toDF("k"), "k",
        depth = 3, width = 16)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    mem.addData(keys.take(4): _*)
    q.processAllAvailable()
    mem.addData(keys.drop(4): _*)   // counters must ACCUMULATE across triggers
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_stream").collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.ops.CountMin.sketch(keys.toDF("k"), "k", 3, 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"stream sketch diverged: $streamed vs $batch")
    // and estimates off the streamed counters match the batch estimates
    val est = graft.ops.CountMin.estimate(spark.table("cms_stream"),
        Seq(3L, 7L, 11L).toDF("k"), "k", 3, 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == Map(3L -> 4L, 7L -> 2L, 11L -> 4L))
  }

  test("streamingCusum carries exact integer state across triggers, equals batch") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    // A level shift split ACROSS triggers: the (C+, C-) state must carry.
    val rows = (0 until 10).map { i =>
      (1L, new Timestamp(1700000000000L + i * 60000L), i.toLong,
        if (i < 5) 10.0 else 30.0)
    }
    val mem = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = graft.streaming.StreamOps.streamingCusum(
        mem.toDF.toDF("user_id", "ts", "event_id", "value"),
        target = 10.0, slack = 2.0, threshold = 30.0,
        tiebreakCol = Some("event_id"))
      .writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").start()
    mem.addData(rows.take(6): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(6): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cusum_stream").collect()
      .map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getBoolean(6))).sortBy(_._1).toSeq
    val batchDf = rows.toDF("user_id", "ts", "event_id", "value")
    val batch = graft.drift.Cusum.detect(batchDf, "value", "ts", "event_id",
        Seq("user_id"), target = 10.0, slack = 2.0, threshold = 30.0)
      .collect()
      .map(r => (r.getAs[Timestamp]("ts").getTime * 1000,
        r.getAs[Double]("value"), r.getAs[Double]("cusum_up"),
        r.getAs[Double]("cusum_down"), r.getAs[Boolean]("alarm")))
      .sortBy(_._1).toSeq
    assert(streamed == batch, s"stream diverged:\n$streamed\nvs\n$batch")
    // the shift (x=30 vs target 10, slack 2 → +18/event from i=5) must
    // alarm within two post-shift events — and it crossed a trigger
    assert(streamed.count(_._5) >= 4)
  }

  test("HLL registers accumulate on a live stream and equal the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    // registers(…) is a max-aggregation, so it runs COMPLETE with
    // ≤ 2^p-bounded state — the streaming cardinality-monitor shape;
    // register max must accumulate across triggers.
    val keys = (1L to 300L).map(i => ("g", s"key_$i"))
    val mem = MemoryStream[(String, String)]
    val q = graft.ops.Hll.registers(mem.toDF.toDF("grp", "k"), "k", Seq("grp"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    mem.addData(keys.take(120): _*)
    q.processAllAvailable()
    mem.addData(keys.drop(120): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_stream").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val batch = graft.ops.Hll.registers(keys.toDF("grp", "k"), "k", Seq("grp"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(streamed == batch, "stream registers diverged from batch")
  }

  test("encoding audit gates a live stream exactly like a batch") {
    implicit val sqlCtx = spark.sqlContext
    // encodingAudit is a stateless codegen'd projection — the hygiene
    // gate composes into a continuous-ingestion chain unchanged.
    val docs = Seq(
      1L -> "clean ascii prose",
      2L -> "mangled cafÃ© text",   // mojibake marker
      3L -> "torn�byte")            // replacement char
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.text.TextAnalysis.encodingAudit(df, "doc_id", "text")
        .filter(col("is_clean"))

    val mem = MemoryStream[(Long, String)]
    val q = gate(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("moji_gate")
      .outputMode("append").start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("moji_gate").collect().map(_.getLong(0)).toSet
    assert(streamed == Set(1L), s"stream hygiene gate kept: $streamed")
    val batch = gate(docs.toDF("doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    assert(batch == streamed)
  }

  test("dedupWithinWatermark drops in-watermark replays as a real stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
      .withColumn("event_key", concat_ws(":", col("user_id"), col("event_type"), col("value")))

    val q = StreamOps.dedupWithinWatermark(streamDf, Seq("event_key"), "ts", "2 hours")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    // first batch, then a replay batch duplicating two of the events
    mem.addData(rows: _*)
    q.processAllAvailable()
    mem.addData(rows.take(2): _*)
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_stream").collect()
    assert(out.length == rows.length, "replayed keys suppressed by state")
    // batch degeneration: same helper on a batch frame = dropDuplicates
    val batch = StreamOps.dedupWithinWatermark(
      (rows ++ rows.take(2)).toDF("ts", "event_type", "value", "user_id")
        .withColumn("event_key", concat_ws(":", col("user_id"), col("event_type"), col("value"))),
      Seq("event_key"))
    assert(batch.count() == rows.length)
  }

  test("sessionize runs as a streaming query with watermarked session windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")

    val q = StreamOps.sessionize(streamDf, gap = "15 minutes", delay = "1 hour")
      .writeStream.format("memory").queryName("sess")
      .outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess").orderBy("user_id", "session_start").collect()
    // user 1: minutes 0,5 within gap -> one session of 2 events;
    // user 2: minutes 10 and 59 are > 15 min apart -> two sessions.
    assert(sessions.length == 3)
    assert(sessions.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq
      == Seq((1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("runningUserTotals carries custom GroupState across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")

    val q = StreamOps.runningUserTotals(streamDf)
      .writeStream.format("memory").queryName("running")
      .outputMode("update").start()
    mem.addData(rows.take(2): _*) // user 1: two events, values 1+2
    q.processAllAvailable()
    mem.addData(rows.drop(2): _*) // user 2 arrives; user 1 unchanged
    q.processAllAvailable()
    q.stop()

    // update mode emits one row per touched key per trigger; the LAST row
    // per user is the accumulated state across both triggers.
    val last = spark.table("running").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) => u -> rs.last }
    assert(last(1L).getAs[Long]("n_events") == 2 &&
      last(1L).getAs[Double]("total_value") == 3.0)
    assert(last(2L).getAs[Long]("n_events") == 2 &&
      last(2L).getAs[Double]("total_value") == 7.0)
  }

  test("runningUserTotals skips null user_id / null value rows") {
    // Nullable event rows are routine; the tuple encoder would otherwise
    // throw "null value in non-nullable field" at runtime.
    val events = Seq[(Option[Long], Option[Double])](
      (Some(1L), Some(2.0)), (None, Some(9.0)), (Some(1L), None), (Some(2L), Some(5.0)))
      .toDF("user_id", "value")
    val out = StreamOps.runningUserTotals(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    assert(out == Map(1L -> (1L, 2.0), 2L -> (1L, 5.0)))
  }

  test("enrich joins a static dimension into a live stream without state") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
    val dim = Seq((1L, "gold"), (2L, "trial")).toDF("user_id", "tier")

    val q = StreamOps.enrich(streamDf, dim, Seq("user_id"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData(rows: _*)
    mem.addData((ts(20), "click", 9.0, 99L)) // key missing from the dimension
    q.processAllAvailable()
    q.stop()

    val out = spark.table("enriched").collect()
    assert(out.length == rows.length + 1, "left join keeps unmatched events")
    val tiers = out.map(r => r.getAs[Long]("user_id") -> r.getAs[String]("tier")).toMap
    assert(tiers(1L) == "gold" && tiers(2L) == "trial" && tiers(99L) == null)
    // batch degeneration: identical join, broadcast (no shuffle of events)
    val batchPlan = StreamOps.enrich(
      rows.toDF("ts", "event_type", "value", "user_id"), dim, Seq("user_id"))
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(batchPlan.contains("BroadcastHashJoin"))
  }

  test("streamingFunnel advances per-user state across triggers (strict order)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
    val steps = Seq("view", "click", "purchase")
    val q = StreamOps.streamingFunnel(streamDf, steps)
      .writeStream.format("memory").queryName("funnel_adv")
      .outputMode("append").start()
    // trigger 1: u1 views then clicks; u2 clicks WITHOUT a view (no-op);
    // one trigger advancing two steps must emit two rows
    mem.addData((ts(0), "view", 0.0, 1L), (ts(5), "click", 0.0, 1L),
      (ts(1), "click", 0.0, 2L))
    q.processAllAvailable()
    // trigger 2: u1 purchases (state remembered from trigger 1); a REPLAY
    // of u1's view must not re-emit; u2 finally views (step 0 only —
    // their earlier click must not count retroactively)
    mem.addData((ts(20), "purchase", 0.0, 1L), (ts(0), "view", 0.0, 1L),
      (ts(30), "view", 0.0, 2L))
    q.processAllAvailable()
    q.stop()
    val rawRows = spark.table("funnel_adv").collect()
    // raw row count FIRST: toMap would silently collapse a re-emitted
    // advance, letting a replay regression pass the keySet check
    assert(rawRows.length === 4, rawRows.mkString(", "))
    val out = rawRows
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.keySet === Set((1L, 0), (1L, 1), (1L, 2), (2L, 0)))
    assert(out((1L, 2)) === ts(20).getTime * 1000)
    // batch degeneration: same builder, same advances, no state store
    val batch = Seq(
      (ts(0), "view", 0.0, 1L), (ts(5), "click", 0.0, 1L),
      (ts(1), "click", 0.0, 2L), (ts(20), "purchase", 0.0, 1L),
      (ts(30), "view", 0.0, 2L)).toDF("ts", "event_type", "value", "user_id")
    val b = StreamOps.streamingFunnel(batch, steps).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(b === out.keySet)
  }

  test("streamingAnomaly carries the trailing ring across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
    // include-current sample z is bounded by (n-1)/sqrt(n), so the
    // stable prefix must be long enough for a spike to clear 3.0:
    // 12 trailing points + spike gives n=13, bound 3.33
    val q = StreamOps.streamingAnomaly(streamDf, frame = 20, threshold = 3.0)
      .writeStream.format("memory").queryName("anom")
      .outputMode("append").start()
    // trigger 1: stable alternating series (no flags, first event null z)
    mem.addData((1 to 12).map(i =>
      (ts(i), "m", if (i % 2 == 0) 11.0 else 9.0, 1L)): _*)
    q.processAllAvailable()
    // trigger 2: the spike is scored against state REMEMBERED from
    // trigger 1 — a fresh state would see n=1 and emit null z instead
    mem.addData((ts(20), "m", 100.0, 1L))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("anom").orderBy("ts_us").collect()
    assert(rows.length === 13)
    assert(rows.head.isNullAt(3), "first event has no trailing frame")
    val spike = rows.last
    assert(spike.getDouble(2) === 100.0 && spike.getBoolean(4),
      s"spike flagged via carried state: $spike")
    assert(rows.init.forall(!_.getBoolean(4)), "stable prefix unflagged")
    // batch degeneration agrees with the batch window operator's flags
    val batchDf = ((1 to 12).map(i =>
      (ts(i), if (i % 2 == 0) 11.0 else 9.0, 1L, i.toLong)) :+
      (ts(20), 100.0, 1L, 20L)).toDF("ts", "value", "user_id", "event_id")
    val streamFlags = StreamOps.streamingAnomaly(batchDf, frame = 20,
        tiebreakCol = Some("event_id"))
      .orderBy("ts_us").select("is_anomaly").collect().map(_.getBoolean(0)).toSeq
    val batchFlags = graft.ops.EventAnalytics.rollingAnomaly(batchDf,
        "user_id", "ts", "value", "event_id", frame = 20)
      .orderBy("event_id").select("is_anomaly").collect().map(_.getBoolean(0)).toSeq
    assert(streamFlags === batchFlags && streamFlags.count(identity) === 1)
  }

  test("intervalJoin pairs two live streams within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val imps = impressions.toDF.toDF("ts", "user_id", "imp_id")
    val clks = clicks.toDF.toDF("ts", "user_id", "click_id")
    assert(imps.isStreaming && clks.isStreaming)

    // click attributed to an impression of the same user within 10 min
    // AFTER the impression (before=0): i1@10:00/u1 matches c1@10:05;
    // c2@10:30 is outside i1's window; u2's click has no impression
    val joined = StreamOps.intervalJoin(imps, clks, Seq("user_id"),
        before = "0 minutes", after = "10 minutes", delay = "1 hour")
      .select(col("imp_id"), col("click_id"))
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    impressions.addData((ts(0), 1L, "i1"), (ts(25), 1L, "i2"))
    clicks.addData((ts(5), 1L, "c1"), (ts(30), 1L, "c2"), (ts(7), 2L, "c3"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attributed").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("i1", "c1"), ("i2", "c2")))

    // state boundedness is structural: the streaming plan carries
    // watermarks on BOTH sides feeding the stream-stream join
    val planned = joined.queryExecution.analyzed.toString
    assert("EventTimeWatermark".r.findAllIn(planned).size === 2, planned)

    // batch degeneration: same builder on batch frames = plain range join
    val bImps = Seq((ts(0), 1L, "i1"), (ts(25), 1L, "i2"))
      .toDF("ts", "user_id", "imp_id")
    val bClks = Seq((ts(5), 1L, "c1"), (ts(30), 1L, "c2"), (ts(7), 2L, "c3"))
      .toDF("ts", "user_id", "click_id")
    val batch = StreamOps.intervalJoin(bImps, bClks, Seq("user_id"),
        before = "0 minutes", after = "10 minutes")
      .select("imp_id", "click_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(batch === out)
  }

  test("leftOuter intervalJoin emits the unmatched row only after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Timestamp, Long, String)]
    val clicks = MemoryStream[(Timestamp, Long, String)]
    val imps = impressions.toDF.toDF("ts", "user_id", "imp_id")
    val clks = clicks.toDF.toDF("ts", "user_id", "click_id")

    val joined = StreamOps.intervalJoin(imps, clks, Seq("user_id"),
        before = "0 minutes", after = "10 minutes", delay = "10 minutes",
        joinType = "leftOuter")
      .select(col("imp_id"), col("click_id"))
    val q = joined.writeStream.format("memory").queryName("attributed_outer")
      .outputMode("append").start()

    // i1@10:00/u1 never gets a click; i2@10:00/u2 matches c2@10:05.
    impressions.addData((ts(0), 1L, "i1"), (ts(0), 2L, "i2"))
    clicks.addData((ts(5), 2L, "c2"))
    q.processAllAvailable()
    // watermark is still at 10:00-ish — i1's window (ends 10:10) can in
    // principle still fill, so NO null-padded row may exist yet
    val early = spark.table("attributed_outer").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(!early.exists(_._2.isEmpty),
      s"null-padded row leaked before the watermark passed: $early")

    // push BOTH watermarks past 10:10 + delay; the unmatched i1 row is
    // emitted by the state-eviction pass of a subsequent trigger
    impressions.addData((ts(45), 9L, "i9"))
    clicks.addData((ts(45), 9L, "c9"))
    q.processAllAvailable()
    impressions.addData((ts(50), 8L, "i8"))
    clicks.addData((ts(50), 8L, "c8"))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("attributed_outer").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out.contains(("i1", None)), s"unmatched left row missing: $out")
    assert(out.contains(("i2", Some("c2"))))
  }

  /** With ProcessingTimeTimeout, Spark schedules no-data batches forever
    * (FlatMapGroupsWithStateExec.shouldRunAnotherBatch is unconditionally
    * true for that conf), so `processAllAvailable()` NEVER sees the stream
    * as idle and blocks indefinitely. TTL tests must await sink contents
    * instead — the continuous batches guarantee new data and expiry are
    * picked up without an explicit barrier. */
  private def awaitUntil(what: String, timeoutMs: Long = 60000L)(cond: => Boolean): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond) {
      if (System.nanoTime() > deadline) fail(s"timed out waiting for $what")
      Thread.sleep(50)
    }
  }

  test("idleTimeout expires runningUserTotals state; a returning key restarts at zero") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
    val q = StreamOps.runningUserTotals(streamDf, idleTimeout = Some("1 milliseconds"))
      .writeStream.format("memory").queryName("running_ttl")
      .outputMode("update").start()

    def u1 = spark.table("running_ttl").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2))).toSet

    mem.addData((ts(0), "click", 5.0, 1L))
    awaitUntil("user 1's first total")(u1.contains((1L, 5.0)))
    // idle past the 1 ms TTL; the timeout pass of a subsequent no-data
    // batch (they run continuously under ProcessingTimeTimeout) expires
    // user 1's state
    Thread.sleep(300)
    // user 1 returns: totals restart from (1, 7.0), not (2, 12.0)
    mem.addData((ts(2), "click", 7.0, 1L))
    awaitUntil("user 1's post-expiry total")(u1.contains((1L, 7.0)))
    q.stop()
    assert(u1 === Set((1L, 5.0), (1L, 7.0)),
      s"state should have expired between user 1's events, got $u1")
  }

  test("event-time TTL survives a fast replay that would expire by wall clock, then expires by stream time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
    // TTL = 10 STREAM-minutes. The replay below delivers events 5
    // stream-minutes apart with a 300 ms wall-clock gap — under the
    // processing-time mode's 1 ms TTL (the existing test above) that gap
    // expires state; in event mode the stream time elapsed is 5 min < TTL,
    // so the totals must accumulate — the replay/backfill-correct behavior.
    val q = StreamOps.runningUserTotals(streamDf,
        idleTimeout = Some("10 minutes"), ttlMode = StreamOps.EventTimeTtl,
        delay = "1 minutes")
      .writeStream.format("memory").queryName("running_evttl")
      .outputMode("update").start()
    def u1 = spark.table("running_evttl").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(2))).toSet

    mem.addData((ts(0), "click", 5.0, 1L))
    q.processAllAvailable()
    Thread.sleep(300) // wall-clock idle ≫ stream-time idle
    mem.addData((ts(5), "click", 7.0, 1L))
    q.processAllAvailable()
    assert(u1.contains((2L, 12.0)),
      s"event-time TTL must not expire mid-replay (5 stream-min < 10): $u1")

    // now stream time DOES pass: user 2's event at minute 30 pushes the
    // watermark (delay 1 min → 10:29) past user 1's last event + TTL
    // (10:05 + 10 = 10:15) → user 1's state expires; their return at
    // minute 35 restarts from zero
    mem.addData((ts(30), "click", 1.0, 2L))
    q.processAllAvailable()
    mem.addData((ts(35), "click", 3.0, 1L))
    q.processAllAvailable()
    q.stop()
    assert(u1.contains((1L, 3.0)),
      s"user 1 should restart after stream-time expiry, got $u1")
    assert(!u1.contains((3L, 15.0)),
      s"user 1's pre-expiry totals must not survive, got $u1")
  }

  test("idleTimeout expires streamingFunnel progress; the user re-enters at step 0") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
    val q = StreamOps.streamingFunnel(streamDf, Seq("view", "click"),
        idleTimeout = Some("1 milliseconds"))
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode("append").start()

    def u1Steps = spark.table("funnel_ttl").collect()
      .filter(_.getLong(0) == 1L).map(_.getInt(1)).toSeq.sorted

    mem.addData((ts(0), "view", 1.0, 1L), (ts(1), "click", 1.0, 1L))
    awaitUntil("user 1's first funnel pass")(u1Steps == Seq(0, 1))
    Thread.sleep(300) // idle past the TTL — progress forgotten
    mem.addData((ts(9), "view", 1.0, 1L)) // user 1 re-enters the funnel
    // step 0 advances TWICE (before and after expiry) — without the TTL
    // the stale state (lastIdx=1) could not re-advance step 0
    awaitUntil("user 1's re-entry at step 0")(u1Steps == Seq(0, 0, 1))
    q.stop()
  }

  test("psiByWindow emits per-window drift scores on a live stream, matching batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.drift.Drift
    val mem = MemoryStream[(Timestamp, String, Double, Long)]
    val streamDf = mem.toDF.toDF("ts", "event_type", "value", "user_id")
    // frozen reference: uniform over [0,10) in 4 bins
    val refProps = Seq(0.25, 0.25, 0.25, 0.25)
    val q = Drift.psiByWindow(streamDf, "ts", "value",
        0.0, 10.0, refProps, windowDur = "30 minutes", delay = "1 hour")
      .writeStream.format("memory").queryName("psi_win")
      .outputMode("append").start()

    // window 10:00-10:30 spans three ref bins; 10:30-11:00 is all bin 0
    val batch1 = Seq(
      (ts(0), "e", 1.0, 1L), (ts(5), "e", 9.0, 1L), (ts(10), "e", 5.0, 2L),
      (ts(40), "e", 2.0, 2L))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    assert(spark.table("psi_win").count() == 0) // nothing closed yet
    // a much later event pushes the watermark past both windows
    val closer = (Timestamp.valueOf("2024-01-01 13:00:00"), "e", 1.0, 3L)
    mem.addData(closer)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("psi_win")
      .orderBy("window_start").collect().map(_.toSeq).toSeq
    assert(streamed.size == 2, s"expected both windows closed, got $streamed")
    // the live result is IDENTICAL to the batch degeneration of the same
    // plan on the same rows (restricted to the closed windows)
    val batch = Drift.psiByWindow((batch1 :+ closer)
        .toDF("ts", "event_type", "value", "user_id"),
        "ts", "value", 0.0, 10.0, refProps, windowDur = "30 minutes")
      .orderBy("window_start").collect().map(_.toSeq).toSeq
      .filter(r => streamed.exists(_.head == r.head))
    assert(streamed == batch)
    // the all-bin-0 window drifts harder than the spread one
    val psiBySize = streamed.map(r => r(2).asInstanceOf[Long] -> r(3).asInstanceOf[Double]).toMap
    assert(psiBySize(1L) > psiBySize(3L))
  }

  test("psiReference refuses an all-null baseline") {
    import graft.drift.Drift
    import spark.implicits._
    val df = Seq((1L, Option.empty[Double]), (2L, None))
      .toDF("id", "value")
    val ex = intercept[IllegalArgumentException] {
      Drift.psiReference(df, "value", bins = 4)
    }
    assert(ex.getMessage.contains("no non-null rows"))
  }

  test("binary hammingProbe screens a live stream against a static index") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.sim.Binary
    val index = Binary.encodeBinary(
      Tables.embeddings(spark, sfDir).filter(col("vec_id") < 50),
      "vec_id", "embedding").localCheckpoint(true)
    // probes: vec 7's exact signs (hamming 0 guaranteed) and its
    // negation (hamming = n_pos + n_neg >> 3, never emitted)
    val v7 = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).toArray
    val probesData = Seq((700L, v7), (701L, v7.map(x => -x)))
    val mem = MemoryStream[(Long, Array[Float])]
    val streamDf = Binary.encodeBinary(
      mem.toDF.toDF("pid", "vec"), "pid", "vec")
    val q = Binary.hammingProbe(streamDf, "pid", index, "vec_id",
        maxDist = 3, bands = 4)
      .writeStream.format("memory").queryName("bin_probe")
      .outputMode("append").start()
    mem.addData(probesData: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("bin_probe").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val hits = streamed.filter(_._1 == 700L)
    assert(hits.nonEmpty && hits.forall(p => p._2 == 7L && p._3 == 0),
      s"probe missed its original: ${streamed.toSeq}")
    assert(!streamed.exists(_._1 == 701L),
      s"negated probe wrongly matched: ${streamed.toSeq}")
    // batch degeneration: distinct pairs equal the batch call's
    val batch = Binary.hammingProbe(
      Binary.encodeBinary(probesData.toDF("pid", "vec"), "pid", "vec"), "pid",
      index, "vec_id", maxDist = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct.toSeq
    assert(streamed.map(p => (p._1, p._2)).distinct.toSeq.sorted == batch.sorted)
  }

  test("shard assignment and the compression signal run unchanged on a live stream") {
    // both are stateless scan projections, so the continuous-ingestion
    // lane (ingest → quality-annotate → shard) is the SAME plan as batch
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val rows = Seq(1L -> "the cat sat", 7L -> ("spam " * 50).trim, 42L -> "one two")
    val mem = MemoryStream[(Long, String)]
    val streamDf = mem.toDF.toDF("doc_id", "text")
    def annotate(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.ops.Sharding.shardId(col("doc_id"), 16).as("shard"),
      graft.text.TextAnalysis.compressionRatio(col("text")).as("ratio"))
    val q = annotate(streamDf)
      .writeStream.format("memory").queryName("shard_stream")
      .outputMode("append").start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("shard_stream").orderBy("doc_id")
      .collect().map(_.toString).toSeq
    val batch = annotate(rows.toDF("doc_id", "text")).orderBy("doc_id")
      .collect().map(_.toString).toSeq
    assert(streamed == batch, s"stream $streamed != batch $batch")
  }

  test("cdcLatest maintains latest-wins state across triggers and suppresses replays") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Double, Long, String)]
    val q = graft.streaming.StreamOps.cdcLatest(
        mem.toDF.toDF("k", "v", "x", "seq", "op"), "k", "seq", "op")
      .writeStream.format("memory").queryName("cdc_stream")
      .outputMode("append").start()
    // trigger 1: update key 1, insert key 2
    mem.addData((1L, "a1", 1.0, 1L, "U"), (2L, "b1", 2.0, 1L, "I"))
    q.processAllAvailable()
    // trigger 2: key 1 deleted at seq 3; a STALE replay of key 2's seq-1
    // insert plus a genuine seq-2 update — the replay must not appear
    mem.addData((1L, "a1", 1.0, 3L, "D"), (2L, "b1", 2.0, 1L, "I"),
      (2L, "b2", 2.5, 2L, "U"))
    q.processAllAvailable()
    // trigger 3: only a stale change for key 2 → NO emission for it
    mem.addData((2L, "b0", 0.0, 1L, "U"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cdc_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    // per trigger, one row per TOUCHED key with its resolved state
    assert(rows.count { case (k, s, o) => k == 1L } == 2)
    assert(rows.contains((1L, 1L, "U")) && rows.contains((1L, 3L, "D")))
    assert(rows.contains((2L, 1L, "I")) && rows.contains((2L, 2L, "U")))
    assert(rows.size == 4, s"stale replays leaked: $rows")
  }

  test("cdcLatest batch degeneration equals applyChanges' latest resolution") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val changes = Seq(
      (1L, "a2", 11.0, 1L, "U"), (1L, "a3", 12.0, 2L, "D"),
      (3L, "c2", 33.0, 1L, "U"), (5L, "e", 50.0, 1L, "I")
    ).toDF("k", "v", "x", "seq", "op")
    val latest = graft.streaming.StreamOps.cdcLatest(changes, "k", "seq", "op")
    val ups = latest.filter(col("op") =!= "D")
      .select(from_json(col("payload"), base.schema).as("p")).select("p.*")
    val surv = base.join(latest.select(col("key").as("k")), Seq("k"), "left_anti")
    val got = surv.unionByName(ups).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val want = graft.ops.Cdc.applyChanges(base, changes, Seq("k"), "seq", "op")
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("cdcLatest fails the query on duplicate (key, seq) and unknown ops") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Double, Long, String)]
    val q = graft.streaming.StreamOps.cdcLatest(
        mem.toDF.toDF("k", "v", "x", "seq", "op"), "k", "seq", "op")
      .writeStream.format("memory").queryName("cdc_dup_stream")
      .outputMode("append").start()
    mem.addData((1L, "a", 1.0, 1L, "U"), (1L, "b", 2.0, 1L, "D"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(e.getMessage.contains("no defined winner") ||
      Option(e.getCause).exists(_.getMessage.contains("no defined winner")))
    q.stop()

    val mem2 = MemoryStream[(Long, String, Double, Long, String)]
    val q2 = graft.streaming.StreamOps.cdcLatest(
        mem2.toDF.toDF("k", "v", "x", "seq", "op"), "k", "seq", "op")
      .writeStream.format("memory").queryName("cdc_badop_stream")
      .outputMode("append").start()
    mem2.addData((1L, "a", 1.0, 1L, "X"))
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(e2.getMessage.contains("ops must be one of") ||
      Option(e2.getCause).exists(_.getMessage.contains("ops must be one of")))
    q2.stop()
  }

  test("cdcLatest refuses a divergent replay at the applied seq; identical stays suppressed") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // identical cross-trigger replay: normal at-least-once noise → suppressed
    val mem = MemoryStream[(Long, String, Double, Long, String)]
    val q = graft.streaming.StreamOps.cdcLatest(
        mem.toDF.toDF("k", "v", "x", "seq", "op"), "k", "seq", "op")
      .writeStream.format("memory").queryName("cdc_replay_ok")
      .outputMode("append").start()
    mem.addData((1L, "a", 1.0, 2L, "U"))
    q.processAllAvailable()
    mem.addData((1L, "a", 1.0, 2L, "U")) // byte-identical replay
    q.processAllAvailable()
    q.stop()
    assert(spark.table("cdc_replay_ok").count() == 1,
      "identical replay must stay suppressed")

    // divergent cross-trigger replay at the APPLIED seq: the log
    // contradicts itself — the query must die, like the batch refusal
    val mem2 = MemoryStream[(Long, String, Double, Long, String)]
    val q2 = graft.streaming.StreamOps.cdcLatest(
        mem2.toDF.toDF("k", "v", "x", "seq", "op"), "k", "seq", "op")
      .writeStream.format("memory").queryName("cdc_replay_bad")
      .outputMode("append").start()
    mem2.addData((1L, "a", 1.0, 2L, "U"))
    q2.processAllAvailable()
    mem2.addData((1L, "DIFFERENT", 9.0, 2L, "U"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(e.getMessage.contains("divergent replay") ||
      Option(e.getCause).exists(_.getMessage.contains("divergent replay")))
    q2.stop()
  }
}
