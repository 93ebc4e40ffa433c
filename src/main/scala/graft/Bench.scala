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
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val regs = SparkEntry.registry
    def materialize(q: graft.queries.Q): Unit =
      q.run(spark, sfDir).queryExecution.toRdd.count(): Unit

    regs.foreach(q => try materialize(q) catch { case _: Throwable => () })

    val results = regs.map { q =>
      System.gc()
      def sample(): Option[Double] = {
        val t0 = System.nanoTime()
        try { materialize(q); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      var samples = (1 to iters).flatMap(_ => sample())
      if (samples.nonEmpty && samples.min < 1.0)
        samples = samples ++ (1 to 2).flatMap(_ => sample())
      val t = if (samples.isEmpty) -1.0 else samples.min
      q.name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
