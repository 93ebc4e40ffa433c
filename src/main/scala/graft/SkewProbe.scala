package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-skew evidence probe (SCALING.md "Skew rung"): derive the ×N
  * ladder corpus, rewrite `source` so ONE join key holds ~90% of the
  * fact rows (the power-law hot key of a real crawl), and drive the
  * same sort-merge join three ways under the distributed master:
  *
  *   A. AQE skew-join ON (the default posture) — expect
  *      OptimizeSkewedJoin to split the hot partition (plan shows
  *      `skew=true`), so no reducer owns 90% of the corpus;
  *   B. AQE skew-join OFF — the counterfactual straggler: the hot key
  *      serializes through one task;
  *   C. skew-join OFF + [[graft.ops.Skew.saltedJoin]] (factor 8) — the
  *      explicit fallback for plans AQE can't re-split.
  *
  * The skew thresholds are scaled to the sandbox corpus (the hot
  * partition here is tens of MB; production defaults trigger at 256 MB
  * — a 100 TB hot key exceeds that by 3+ orders of magnitude), which is
  * recorded in the artifact: the probe demonstrates the MECHANISM at
  * proportional size, not the absolute default.
  *
  * Usage: `sbt package` then `runMain graft.SkewProbe [factor]` with
  * the ScaleLadder distributed env (SPARK_GRAFT_MASTER=
  * local-cluster[2,8,24576], SPARK_GRAFT_APP_JAR=<packaged jar>).
  * Writes skew_detail.json.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(16)
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // Force the shuffled-join path: a 21-row dim would broadcast and
      // hide the skewed exchange this probe exists to exercise.
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // Sandbox-proportional skew thresholds (see scaladoc).
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESHOLD", "8m"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_SKEW_ADVISORY", "8m"))
    val spark = (if (master.startsWith("local-cluster")) {
      val b = builder.config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "20g"))
      sys.env.get("SPARK_GRAFT_APP_JAR").map(j => b.config("spark.jars", j))
        .getOrElse(b)
    } else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = new java.io.File(System.getProperty("java.io.tmpdir"), "graft-scale")
    val dir = new java.io.File(base, s"x$factor").getAbsolutePath
    ScaleCorpus.derive(spark, srcDir, dir, factor)

    // The skewed fact: ~90% of documents share one source key — the
    // boilerplate/hot-domain shape of a real crawl. Deterministic (id
    // mod), so every mode joins the identical frame.
    def fact: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 9, lit("src_hot"))
          .otherwise(col("source")).as("source"),
        col("text"))
    // Dimension: one weight row per source (dimension-sized, but the
    // probe forbids broadcasting it — see builder conf). MATERIALIZED as
    // a local relation, deliberately: OptimizeSkewedJoin pattern-matches
    // SMJ(Sort(Shuffle), Sort(Shuffle)) — a dim arriving through its own
    // aggregation (e.g. a distinct() kept lazy in the plan) interposes a
    // HashAggregate between the Sort and the shuffle stage and silently
    // DISABLES the skew rule (measured here first-hand; that failure
    // mode is exactly when the salted fallback earns its keep).
    lazy val dim: DataFrame = {
      val sources = fact.select(col("source")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq // bounded: one row per source
      import spark.implicits._
      sources.map(s => (s, s.length.toDouble / 10.0)).toDF("source", "w")
    }

    // GLOBAL aggregate downstream, deliberately: a groupBy on the JOIN
    // key would inherit the join's hash partitioning, and AQE refuses to
    // split a skewed join whose output distribution a downstream
    // operator relies on — the split would break key co-location. A
    // global agg partial-aggregates per partition, so the join output
    // has no required distribution and the skew rule is free to act
    // (exactly the shape of a scoring/filter pass over a joined corpus).
    def work(joined: DataFrame): DataFrame =
      joined.agg(count(lit(1)).as("n"),
        sum(crc32(col("text")).cast("double") * col("w")).as("weighted"))

    def run(label: String, skewJoin: Boolean, salted: Boolean): (Double, String, Long) = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      def once(): (Double, String, Long) = {
        val joined =
          if (salted) graft.ops.Skew.saltedJoin(fact, dim, "source",
            factor = 8, seedCols = Seq(col("doc_id")))
          else fact.join(dim, Seq("source"))
        val out = work(joined)
        val t0 = System.nanoTime()
        val n = out.queryExecution.toRdd.count()
        val t = (System.nanoTime() - t0) / 1e9
        (t, out.queryExecution.executedPlan.toString, n)
      }
      val warm = once()
      System.gc()
      val a = once(); val b = once()
      val best = if (a._1 <= b._1) a else b
      println(f"[skew] $label%-28s ${best._1}%8.2f s (warm ${warm._1}%.2f) rows=${best._3}")
      best
    }

    val hot = fact.groupBy("source").count().orderBy(col("count").desc)
      .limit(1).collect()(0)
    val total = fact.count()
    println(s"[skew] corpus x$factor: $total rows, hot key '${hot.getString(0)}' " +
      f"holds ${hot.getLong(1)} (${100.0 * hot.getLong(1) / total}%.1f%%)")

    val aqe = run("A: AQE skew-join ON", skewJoin = true, salted = false)
    val straggler = run("B: skew-join OFF", skewJoin = false, salted = false)
    val saltRun = run("C: OFF + saltedJoin(8)", skewJoin = false, salted = true)

    val aqeSplit = aqe._2.contains("skew=true")
    println(s"[skew] AQE split observed in executed plan: $aqeSplit")
    // Keep only the join lines of the plans — the artifact wants the
    // decision, not 200 lines of scan detail.
    def joinLines(p: String): String = p.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")
        || l.contains("AQEShuffleRead"))
      .map(_.trim).mkString(" | ")
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val loadFp: String = try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      val parts = try src.mkString.trim.split("\\s+") finally src.close()
      s""""load":{"l1":${parts(0)},"l5":${parts(1)},"l15":${parts(2)}}"""
    } catch { case _: Exception => s""""load":{}""" }
    val json =
      s"""{"metric":"skew_probe","master":"$master","factor":$factor,""" +
        s""""rows":$total,"hot_share":${fmt(hot.getLong(1).toDouble / total)},""" +
        s""""threshold":"${sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESHOLD", "8m")}",$loadFp,""" +
        s""""aqe_on_sec":${fmt(aqe._1)},"aqe_split_observed":$aqeSplit,""" +
        s""""skew_off_sec":${fmt(straggler._1)},"salted_sec":${fmt(saltRun._1)},""" +
        s""""aqe_plan":"${esc(joinLines(aqe._2))}",""" +
        s""""off_plan":"${esc(joinLines(straggler._2))}",""" +
        s""""salted_plan":"${esc(joinLines(saltRun._2))}"}"""
    println(json)
    val w = new java.io.PrintWriter("skew_detail.json", "UTF-8")
    try w.println(json) finally w.close()
    spark.stop()
  }
}
