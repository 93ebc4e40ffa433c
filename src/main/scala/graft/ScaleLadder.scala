package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-ladder evidence tools (SURVEY §5): derive a deterministic N×
  * corpus from the sf0.1 tables and measure the heavy dedup/ANN family's
  * growth exponent across it.
  *
  * Everything the engine claims about 100 TB behavior is plan-shaped
  * (PlanQualitySpec pins pushdown/broadcast/partition pruning), but plans
  * don't expose super-linear CONSTANTS — a quadratic per-row lambda or a
  * candidate-pair blow-up only shows up when the data actually grows. The
  * driver corpus is read-only and capped at sf0.1, so the ladder derives
  * its own larger corpus in java.io.tmpdir:
  *
  *   copy 0   = the sf0.1 table verbatim;
  *   copy k>0 = ids shifted to a disjoint band (doc/vec/user ids by
  *              k·10⁷ = k·IdBand; event_id by k·10⁹ = k·100·IdBand,
  *              since event ids already span more than one 10⁷ band at
  *              sf0.1) and content re-seeded so copies don't collide:
  *              - documents: every token suffixed `~k` — token/shingle/gram
  *                equality (and hence the planted dup structure) is
  *                PRESERVED WITHIN a copy and DESTROYED ACROSS copies, so
  *                duplicate pairs/spans scale linearly with the factor,
  *                like a real corpus, instead of quadratically like naive
  *                replication;
  *              - embeddings: deterministic per-element jitter (xxhash64 of
  *                (vec_id, k, i), amplitude 0.02) — cluster geometry is
  *                kept, exact clones across copies are not;
  *              - events: event/user ids shifted, timestamps kept — series
  *                count scales, per-series length (window cost) does not.
  *
  * Determinism: no RNG anywhere — content is a pure function of (source
  * row, k), so two runs derive byte-identical corpora and ladder numbers
  * are reproducible.
  */
object ScaleCorpus {

  val IdBand = 10000000L

  /** Derive `srcDir`'s documents/embeddings/events at `factor`× into
    * `outDir` (only the tables the heavy family reads; the TPC-H star is
    * driver-owned and not part of the ladder). Idempotent via a DONE
    * marker. */
  def derive(spark: SparkSession, srcDir: String, outDir: String, factor: Int): Unit = {
    val done = new java.io.File(outDir, "_LADDER_DONE")
    if (done.exists()) return
    val parts = math.max(factor, spark.sparkContext.defaultParallelism)

    def write(df: DataFrame, name: String): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // A source id at or above its band width would collide with the
    // shifted copies, silently merging rows across bands and corrupting
    // the ladder's "duplicates scale linearly" premise — refuse instead.
    def assertBand(df: DataFrame, idCol: String, band: Long, table: String): Unit = {
      // max over an empty table is SQL null — diagnose, don't NPE
      val row = df.agg(max(col(idCol))).collect()(0)
      require(!row.isNullAt(0),
        s"$table is empty — cannot derive a ladder corpus from it")
      val mx = row.getLong(0)
      require(mx < band,
        s"$table.$idCol max $mx >= band width $band — shifted copies " +
          "would collide; widen the band before deriving")
    }

    val d = spark.read.parquet(s"$srcDir/documents.parquet")
    assertBand(d, "doc_id", IdBand, "documents")
    write((0 until factor).map { k =>
      if (k == 0) d
      else d.select(
        (col("doc_id") + lit(k * IdBand)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", "$1~" + k).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")))
    }.reduce(_ unionByName _), "documents")

    val e = spark.read.parquet(s"$srcDir/embeddings.parquet")
    assertBand(e, "vec_id", IdBand, "embeddings")
    write((0 until factor).map { k =>
      if (k == 0) e
      else e.select(
        (col("vec_id") + lit(k * IdBand)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + ((pmod(xxhash64(col("vec_id"), lit(k), i), lit(1000))
            .cast("double") / 1000.0 - 0.5) * 0.02).cast("float")).cast("float")
        ).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _), "embeddings")

    // events.ts is parquet TIMESTAMP(NANOS); read as long (Tables.events
    // handles either form on the way back in).
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    val ev = spark.read.parquet(s"$srcDir/events.parquet")
    assertBand(ev, "event_id", 100 * IdBand, "events")
    assertBand(ev, "user_id", IdBand, "events")
    write((0 until factor).map { k =>
      if (k == 0) ev
      else ev
        .withColumn("event_id", col("event_id") + lit(k * 100 * IdBand))
        .withColumn("user_id", col("user_id") + lit(k * IdBand))
    }.reduce(_ unionByName _), "events")

    // orders + lineitem (r12): both shift o_orderkey/l_orderkey by the
    // SAME band, so the FK join structure replicates intact — the CDC
    // lifecycle and the lineitem-valued operators (winsorize, IQR) can
    // ladder. Values repeat verbatim across bands: exactly the regime
    // where the value-histogram lanes should flatline.
    val o = spark.read.parquet(s"$srcDir/orders.parquet")
    assertBand(o, "o_orderkey", IdBand, "orders")
    write((0 until factor).map { k =>
      if (k == 0) o
      else o.withColumn("o_orderkey", col("o_orderkey") + lit(k * IdBand))
    }.reduce(_ unionByName _), "orders")
    val li = spark.read.parquet(s"$srcDir/lineitem.parquet")
    assertBand(li, "l_orderkey", IdBand, "lineitem")
    write((0 until factor).map { k =>
      if (k == 0) li
      else li.withColumn("l_orderkey", col("l_orderkey") + lit(k * IdBand))
    }.reduce(_ unionByName _), "lineitem")

    done.createNewFile(): Unit
  }
}

/** Ladder runner: `runMain graft.ScaleLadder [query ...]`.
  *
  * For each factor in SPARK_GRAFT_LADDER_FACTORS (default 1,4,16,64) and
  * each query, runs warm-up + min-of-SPARK_GRAFT_BENCH_ITERS (default 2)
  * with Bench's materialization discipline, then fits the growth exponent
  * b of t = a·f^b by least squares on (ln f, ln t) over factors ≥ 4 (the
  * ×1 point is dominated by fixed plan/JVM overhead that would bias b
  * DOWN; with it excluded, b is the marginal data-growth exponent — the
  * number that predicts 100× behavior). A query whose run exceeds
  * SPARK_GRAFT_LADDER_CUTOFF seconds (default 180) is not advanced to the
  * next factor — reported as `truncated` rather than hanging the ladder;
  * a query that THROWS is reported with its exception under `failed`
  * (never as truncated — a crash is not a deliberate cutoff).
  * Writes scaling_detail.json (override: SPARK_GRAFT_LADDER_OUT) for
  * SCALING.md.
  *
  * Distributed mode: SPARK_GRAFT_MASTER=local-cluster[2,8,24576] runs
  * the same ladder against REAL executor JVMs — serialized task
  * closures, network shuffle exchange, and broadcast transport instead
  * of in-process references — the one execution-path class a local[n]
  * run cannot price. Requires SPARK_GRAFT_APP_JAR (the `sbt package`
  * jar) so executors load the query classes; executor memory via
  * SPARK_GRAFT_EXEC_MEM (default 20g per worker).
  */
object ScaleLadder {
  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt
    val cutoff = sys.env.getOrElse("SPARK_GRAFT_LADDER_CUTOFF", "180").toDouble
    val factors = sys.env.getOrElse("SPARK_GRAFT_LADDER_FACTORS", "1,4,16,64")
      .split(",").map(_.trim.toInt).toSeq
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_LADDER_OUT", "scaling_detail.json")
    val defaultQueries = Seq(
      "dedup_minhash", "dedup_components", "dedup_spans", "dedup_jaccard",
      "ann_ivfpq", "ann_ivfpq_rerank", "llm_curation_full", "text_tfidf")
    val names = if (args.nonEmpty) args.toSeq else defaultQueries

    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
    val spark = (if (master.startsWith("local-cluster")) {
      val b = builder
        .config("spark.executor.memory",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "20g"))
      // Ship the application jar to the executor JVMs — the point of
      // the distributed rung is that NOTHING rides in-process references.
      sys.env.get("SPARK_GRAFT_APP_JAR").map(j => b.config("spark.jars", j))
        .getOrElse(b)
    } else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    val queries = names.map(n => byName.getOrElse(n, sys.error(s"unknown query '$n'")))

    val base = new java.io.File(System.getProperty("java.io.tmpdir"), "graft-scale")
    def dirFor(f: Int): String =
      if (f == 1) srcDir
      else {
        val d = new java.io.File(base, s"x$f").getAbsolutePath
        ScaleCorpus.derive(spark, srcDir, d, f)
        d
      }

    // (query, factor) -> seconds; LinkedHashMap keeps report order stable.
    val times = scala.collection.mutable.LinkedHashMap[(String, Int), Double]()
    val alive = scala.collection.mutable.Set[String](names: _*)
    // A crash is NOT a deliberate cutoff: record the exception per query
    // so the artifact distinguishes "stopped advancing because slow"
    // (truncated) from "broke" (failed) — a reader of scaling_detail.json
    // must not mistake one for the other.
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()

    factors.foreach { f =>
      if (alive.nonEmpty) {
        val dir = dirFor(f)
        println(s"[ladder] factor x$f dir=$dir queries=${alive.size}")
        queries.filter(q => alive(q.name)).foreach { q =>
          def once(): Double = {
            // same between-sample cache clear as Bench: queries with an
            // in-plan persist must pay their full cost every sample, or
            // the ladder fits an exponent on warm-cache reads
            spark.sharedState.cacheManager.clearCache()
            val t0 = System.nanoTime()
            q.run(spark, dir).queryExecution.toRdd.count(): Unit
            (System.nanoTime() - t0) / 1e9
          }
          try {
            val w = once() // warm-up
            System.gc()
            val t = if (w > cutoff) w else (1 to iters).map(_ => once()).min
            times((q.name, f)) = t
            println(f"[ladder] ${q.name}%-22s x$f%-3d ${t}%8.2f s")
            if (t > cutoff) {
              alive -= q.name
              println(s"[ladder] ${q.name} exceeded cutoff ${cutoff}s — not advancing")
            }
          } catch {
            case e: Throwable =>
              alive -= q.name
              failed(q.name) =
                s"x$f: ${e.getClass.getSimpleName}: ${e.getMessage}"
              println(s"[ladder] ${q.name} FAILED at x$f: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        }
      }
    }

    // Exponent fit on factors >= 4 (see scaladoc).
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val report = names.map { n =>
      val pts = factors.flatMap(f => times.get((n, f)).map(t => (f, t)))
      val fit = pts.filter(_._1 >= 4).map { case (f, t) => (math.log(f), math.log(t)) }
      val b =
        if (fit.size < 2) Double.NaN
        else {
          val mx = fit.map(_._1).sum / fit.size
          val my = fit.map(_._2).sum / fit.size
          fit.map { case (x, y) => (x - mx) * (y - my) }.sum /
            fit.map { case (x, _) => (x - mx) * (x - mx) }.sum
        }
      val ptsJson = pts.map { case (f, t) => s""""x$f":${fmt(t)}""" }.mkString("{", ",", "}")
      val bJson = if (b.isNaN) "null" else fmt(b)
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val failJson = failed.get(n)
        .map(m => "\"" + esc(m) + "\"").getOrElse("null")
      // truncated = stopped advancing because SLOW; failed = broke
      val trunc = !alive(n) && !failed.contains(n)
      s""""$n":{"times":$ptsJson,"exponent":$bJson,"truncated":$trunc,"failed":$failJson}"""
    }.mkString("{", ",", "}")

    val loadFp: String = try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      val parts = try src.mkString.trim.split("\\s+") finally src.close()
      s""""load":{"l1":${parts(0)},"l5":${parts(1)},"l15":${parts(2)}}"""
    } catch { case _: Exception => s""""load":{}""" }
    val line =
      s"""{"metric":"scaling","master":"$master","cpus":$cpus,"iters":$iters,"factors":"${factors.mkString(",")}",$loadFp,"queries":$report,"src":"$srcDir"}"""
    println(line)
    val w = new java.io.PrintWriter(outFile, "UTF-8")
    try w.println(line) finally w.close()
    spark.stop()
  }
}
