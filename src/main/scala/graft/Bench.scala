package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line with per-query seconds.
  *
  * Measurement discipline (single cold runs were observed up to 14× apart
  * on identical code):
  *  - fixed query order (registration order, not Map iteration order)
  *  - one full untimed warm-up pass (JIT, codegen cache, parquet footers)
  *  - MINIMUM of `SPARK_GRAFT_BENCH_ITERS` (default 3) timed runs per
  *    query, +2 extra samples for sub-second queries: timing noise (GC,
  *    scheduler, JIT recompilation) is one-sided additive, so the min is
  *    the standard steady-state estimator and is far more stable across
  *    JVMs than a median
  *  - System.gc() before each query so one query's garbage debt doesn't
  *    bill the next one's samples
  *  - materialization via `queryExecution.toRdd.count()`, which evaluates
  *    every output column — a plain `df.count()` lets Catalyst prune the
  *    computed columns and undertimes expression-heavy queries.
  */
object Bench {
  /** Current 1-minute loadavg, or -1 when unreadable. */
  private def l1(): Double = try {
    val src = scala.io.Source.fromFile("/proc/loadavg")
    try src.mkString.trim.split("\\s+")(0).toDouble finally src.close()
  } catch { case _: Exception => -1.0 }

  /** Quiet-load gate (the r11 lesson: a bench taken at l1 = 9.8 needed
    * load-adjustment archaeology to compare across rounds). Wait for the
    * 1-minute loadavg to drop below `SPARK_GRAFT_BENCH_MAXLOAD`
    * (default 2.0; 0 disables) for up to `SPARK_GRAFT_BENCH_WAIT_S`
    * (default 600 s), then RUN REGARDLESS — a missing BENCH artifact is
    * worse than a weather-stamped one — and return (pre-run l1, whether
    * the gate was satisfied) for the detail line. */
  private def quietGate(): (Double, Boolean) = {
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOAD", "2.0").toDouble
    val waitS = sys.env.getOrElse("SPARK_GRAFT_BENCH_WAIT_S", "600").toLong
    if (maxLoad <= 0) return (l1(), true)
    val deadline = System.nanoTime() + waitS * 1000000000L
    var cur = l1()
    while (cur > maxLoad && System.nanoTime() < deadline) {
      System.err.println(
        f"[bench] ambient l1 = $cur%.2f > $maxLoad%.1f — waiting for quiet " +
          "(SPARK_GRAFT_BENCH_MAXLOAD=0 disables)")
      Thread.sleep(30000)
      cur = l1()
    }
    if (cur > maxLoad) System.err.println(
      f"[bench] still loud after ${waitS}s (l1 = $cur%.2f) — running anyway; " +
        "numbers carry weather (min-of-N damps it; see load in the detail line)")
    (cur, cur <= maxLoad)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val (preL1, quiet) = quietGate()
    // SPARK_GRAFT_BENCH_RESTART_EVERY = N > 0 stops and rebuilds the
    // SparkSession every N timed queries — the marathon-hygiene lever:
    // a full-registry run accumulates session state (shuffle files on
    // /tmp evicting parquet pages, listener/broadcast debt) that taxes
    // LATE-order queries; isolated re-runs land faster than their
    // in-marathon numbers (measured r12, see SCALING.md). Restarting
    // trades ~5 s per restart for position-independent numbers.
    // Default 16 since r13: the restart lane is the canonical series
    // (the r12 marathon headline carried 15% session-aging inflation and
    // 4.3× on the worst key; set 0 to reproduce the old marathon lane).
    val restartEvery =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RESTART_EVERY", "16").toInt
    def build(): SparkSession = {
      val sp = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // ERROR, not WARN: expected per-query WARNs (e.g. single-partition
      // window notes on distinct-value CDF scans) would otherwise flood
      // the bounded stdout tail the harness parses the JSON line from.
      sp.sparkContext.setLogLevel("ERROR")
      sp
    }
    var spark = build()

    val regs = SparkEntry.registry
    def materialize(q: graft.queries.Q): Unit =
      q.run(spark, sfDir).queryExecution.toRdd.count(): Unit
    // Index/LM builders .cache() per invocation, and every sample is a
    // fresh invocation — without clearing, a 155-query × several-sample
    // run accumulates hundreds of orphaned cached tables (LRU eviction
    // keeps it CORRECT, but the executor storage pool stays pinned and
    // later queries' shuffles spill earlier than they should). Queries
    // share no cached state across invocations, so clearing between
    // queries changes no result and no steady-state timing.
    def clearCaches(): Unit = spark.sharedState.cacheManager.clearCache()

    // Queries warmed in the CURRENT session. The r12 restart lane
    // re-warmed only the query at each restart boundary, so the other
    // restartEvery-1 queries in the window paid fresh-session cold costs
    // (codegen/JIT, FileIndex/footer caches) inside their first timed
    // sample — measured: text_quality_panel 7.06 s med in-lane vs 2.9 s
    // in a properly warmed fresh JVM. Every query now warms once per
    // session, lazily, just before its timed samples. (r15: the former
    // additional up-front `regs.foreach(warm)` pass warmed the WHOLE
    // registry in session 1, but every restart — every `restartEvery`
    // queries — wipes `warmedInSession`, so all but the first window's
    // warm-ups were discarded and re-done lazily anyway: a full untimed
    // registry pass (~8-12 min at sf0.1) of pure waste that pushed the
    // full-registry run past the measurement harness's wall-clock window.
    // Removing it changes no per-query number: each query still executes
    // once untimed in its own session before its timed samples.)
    var warmedInSession = scala.collection.mutable.Set.empty[String]
    def warm(q: graft.queries.Q): Unit =
      if (!warmedInSession.contains(q.name)) {
        try materialize(q) catch { case _: Throwable => () }
        clearCaches()
        warmedInSession += q.name
      }

    // Per query: (min, median, sample count). The min is the headline
    // (one-sided-noise steady-state estimator, as above); the median
    // rides along in the DETAIL artifact so ambient load is visible in
    // the artifact itself — a med/min ratio near 1 says the machine was
    // quiet, a large one says the absolute numbers carry weather
    // (the r9 round-over-round comparison needed loadavg archaeology to
    // establish exactly this).
    var timedIdx = 0
    val results = regs.map { q =>
      if (restartEvery > 0 && timedIdx > 0 && timedIdx % restartEvery == 0) {
        spark.stop()
        spark = build()
        warmedInSession = scala.collection.mutable.Set.empty[String]
      }
      timedIdx += 1
      // first execution in this session warms untimed (no-op if the
      // initial pass or an earlier sample in this session already did)
      warm(q)
      System.gc()
      def sample(): Option[Double] = {
        // clear BEFORE the timer: queries with an in-plan persist (the
        // curation chains materialize their multi-consumer gate stage)
        // would otherwise have samples 2..n read sample 1's cache via
        // plan-equality reuse and report warm-cache numbers as min
        clearCaches()
        val t0 = System.nanoTime()
        try { materialize(q); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      var samples = (1 to iters).flatMap(_ => sample())
      if (samples.nonEmpty && samples.min < 1.0)
        samples = samples ++ (1 to 2).flatMap(_ => sample())
      val stats =
        if (samples.isEmpty) (-1.0, -1.0, 0)
        else {
          val s = samples.sorted
          val med =
            if (s.size % 2 == 1) s(s.size / 2)
            else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
          (s.head, med, s.size)
        }
      clearCaches()
      q.name -> stats
    }
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // The harness that reads this output keeps only the TAIL of stdout
    // (observed: last 2000 chars) and parses the JSON line out of that
    // window — a long line whose head falls outside the window is
    // unparseable. So: (1) full-precision detail on its own line first
    // (for humans; its head may be cut, which is fine), then (2) a
    // compact 3-decimal line LAST, hard-capped at 1900 chars by keeping
    // the slowest queries if the full map ever outgrows the budget
    // (JSON maps are order-insensitive). build.sbt sets showSuccess :=
    // false so this really is the final line of stdout.
    // Locale.ROOT: f"%.3f" under a comma-decimal default locale would
    // emit 0,123 and break the JSON contract.
    def fmt(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def line(entries: Seq[(String, Double)]): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    }
    // Detail entries carry the variance column: {"min":…,"med":…,"n":…}.
    val detail = results.map { case (k, (mn, md, n)) =>
      s"\"" + k + s"\":{\"min\":$mn,\"med\":$md,\"n\":$n}"
    }.mkString("{", ",", "}")
    // Machine-load fingerprint, so a reader can separate code from climate
    // without round-over-round archaeology: /proc/loadavg is
    // "l1 l5 l15 running/total lastpid". A clean idle run has l1 well
    // below the bench's own CPU count and running in the low single digits.
    val loadFp: String = try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      val parts = try src.mkString.trim.split("\\s+") finally src.close()
      val rt = parts(3).split("/")
      s""""load":{"l1":${parts(0)},"l5":${parts(1)},"l15":${parts(2)},""" +
        s""""procs_running":${rt(0)},"procs_total":${rt(1)},"bench_cpus":$cpus,""" +
        s""""pre_l1":$preL1,"quiet_gate":$quiet,"restart_every":$restartEvery}"""
    } catch { case _: Exception =>
      s""""load":{"bench_cpus":$cpus,"pre_l1":$preL1,"quiet_gate":$quiet,"restart_every":$restartEvery}""" }
    val detailLine =
      s"""{"metric":"total_detail","value":$total,"unit":"sec",$loadFp,"queries":$detail,"sf":"$sfDir"}"""
    println(detailLine)
    // Also persist the COMPLETE per-query map as a file artifact: the
    // capped stdout line below drops the fastest queries once the
    // registry outgrows its 1900-char budget, which silently loses
    // round-over-round diff coverage for the dropped entries.
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(detailLine) finally w.close()
    } catch {
      case e: Exception => System.err.println(s"[bench] detail artifact write failed: $e")
    }
    val mins = results.map { case (k, (mn, _, _)) => k -> mn }
    val full = line(mins)
    val out =
      if (full.length <= 1900) full
      else {
        val slowestFirst = mins.sortBy(-_._2)
        var budget = 1900 - line(Nil).length
        val kept = slowestFirst.takeWhile { case (k, v) =>
          val cost = k.length + fmt(v).length + 4
          val ok = budget - cost >= 0
          if (ok) budget -= cost
          ok
        }.map(_._1).toSet
        line(mins.filter(r => kept(r._1)))
      }
    println(out)
    spark.stop()
  }
}

/** Single-query timing for iteration: `runMain graft.BenchOne <name>...`
  * — same session config, warm-up, and min-of-iters discipline as
  * [[Bench]], but only the named queries. Not part of the driver
  * contract; a dev tool for optimizing one operator without paying the
  * full-registry run. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    args.foreach { name =>
      val q = byName.getOrElse(name,
        sys.error(s"unknown query '$name' (${byName.keys.toSeq.sorted.take(5).mkString(", ")}...)"))
      def once(): Double = {
        // same between-sample cache clear as Bench (in-plan persists
        // must not let later samples ride sample 1's cache)
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        q.run(spark, sfDir).queryExecution.toRdd.count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      System.gc()
      var samples = (1 to iters).map(_ => once())
      // same sub-second top-up as Bench, so fast-query numbers compare
      if (samples.min < 1.0) samples = samples ++ (1 to 2).map(_ => once())
      println(f"[benchone] $name%-30s ${samples.min}%8.3f s (min of ${samples.size})")
    }
    spark.stop()
  }
}
