package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew rung for the engine's heaviest real exchange — the MinHash LSH
  * band self-join (SCALING.md "MinHash mega-cluster rung").
  *
  * The planted shape: a boilerplate mega-cluster — `hotShare` of all
  * documents rewritten to ONE identical text (site chrome, license
  * headers, templated pages; every real crawl has this). Identical text
  * → identical 64-lane signature → the same band hash in EVERY band, so
  * the candidate self-join's hot bucket emits bands·m·(m−1)/2 pairs.
  * This is the skew class AQE cannot repair: OptimizeSkewedJoin splits a
  * hot PARTITION across tasks, but the quadratic OUTPUT still has to be
  * produced, shuffled to the distinct, and estimated (m = 10⁸ at 100 TB
  * → 10¹⁶ candidate pairs — unrunnable no matter how it is split).
  *
  * Two modes over the SAME derived ×factor corpus:
  *
  *   A. collapsed — [[graft.dedup.MinHash.dedup]] as shipped: identical
  *      signatures collapse to their min-id representative through one
  *      skew-robust aggregation (map-side partial combine), so the
  *      mega-cluster enters the band join as ONE row;
  *   B. pair-derived — the pre-collapse counterfactual (losers read off
  *      the full [[graft.dedup.MinHash.nearDuplicatePairs]] list), which
  *      pays the quadratic bucket.
  *
  * The probe asserts both modes keep the SAME document set (the collapse
  * is an optimization, not a semantics change), times both, records the
  * hot-bucket arithmetic, and checks whether AQE flagged the band join
  * skewed in mode B (it typically does — and it still cannot help).
  *
  * Usage: `runMain graft.MinHashSkewProbe [factor]` (default 64);
  * SPARK_GRAFT_MH_HOT overrides the planted share (default 0.01).
  * Writes skew_minhash.json.
  */
object MinHashSkewProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(64)
    val hotShare = sys.env.getOrElse("SPARK_GRAFT_MH_HOT", "0.01").toDouble
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // sandbox-proportional skew thresholds (the SkewProbe convention)
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

    // One fixed boilerplate text — long enough that shingling is real
    // work, identical across ladder copies (the rewrite happens AFTER the
    // copy-suffixing, so the cluster genuinely spans the whole corpus).
    val boiler = (1 to 60).map(i => s"boilerplate_token_$i").mkString(" ")
    val mod = 1000000L
    val cut = (hotShare * mod).toLong
    def corpus: DataFrame = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(pmod(col("doc_id") * lit(2654435761L) % lit(999999937L), lit(mod)) < cut,
          lit(boiler)).otherwise(col("text")).as("text"))

    val total = corpus.count()
    val m = corpus.filter(col("text") === boiler).count()
    val bands = 16
    val hotPairs = bands.toLong * m * (m - 1) / 2
    println(s"[mh-skew] corpus x$factor: $total docs, mega-cluster m=$m " +
      s"(${100.0 * m / total}%), hot-bucket candidates = $hotPairs")

    def time(f: => DataFrame): (Double, Long, String) = {
      val df = f
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      ((System.nanoTime() - t0) / 1e9, n, df.queryExecution.executedPlan.toString)
    }

    // Mode A: shipped collapsed dedup (warm + timed)
    def collapsed: DataFrame =
      graft.dedup.MinHash.dedup(corpus, "text", "doc_id", threshold = 0.7)
    val warmA = time(collapsed)
    System.gc()
    val a = time(collapsed)
    println(f"[mh-skew] A collapsed    ${a._1}%8.2f s (warm ${warmA._1}%.2f) kept=${a._2}")

    // Mode B: the pre-collapse counterfactual — losers off the raw pair
    // list (the exact formulation dedup used before the collapse).
    def pairDerived: DataFrame = {
      val c = corpus
      val losers = graft.dedup.MinHash
        .nearDuplicatePairs(c, "text", "doc_id", threshold = 0.7)
        .select(col("id_b").as("_gf_loser")).distinct()
      c.join(losers, c("doc_id") === col("_gf_loser"), "left_anti")
    }
    val warmB = time(pairDerived)
    System.gc()
    val b = time(pairDerived)
    println(f"[mh-skew] B pair-derived ${b._1}%8.2f s (warm ${warmB._1}%.2f) kept=${b._2}")

    require(a._2 == b._2,
      s"collapse changed the kept set: ${a._2} vs ${b._2} — the modes must agree")
    val aqeSplit = b._3.contains("skew=true")
    println(s"[mh-skew] AQE flagged the band join skewed in mode B: $aqeSplit")

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val loadFp: String = try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      val parts = try src.mkString.trim.split("\\s+") finally src.close()
      s""""load":{"l1":${parts(0)},"l5":${parts(1)},"l15":${parts(2)}}"""
    } catch { case _: Exception => s""""load":{}""" }
    val json =
      s"""{"metric":"minhash_skew_probe","master":"$master","factor":$factor,""" +
        s""""docs":$total,"cluster_m":$m,"hot_share":${fmt(m.toDouble / total)},""" +
        s""""hot_bucket_candidates":$hotPairs,$loadFp,""" +
        s""""collapsed_sec":${fmt(a._1)},"pair_derived_sec":${fmt(b._1)},""" +
        s""""kept":${a._2},"kept_equal":true,"aqe_split_observed_b":$aqeSplit}"""
    println(json)
    val w = new java.io.PrintWriter("skew_minhash.json", "UTF-8")
    try w.println(json) finally w.close()
    spark.stop()
  }
}
