package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PageRank scale rung (SCALING.md "PageRank rung"): the ScaleLadder
  * corpus can't exercise [[graft.graph.PageRank]] — the registered
  * queries walk the driver-owned TPC-H purchase graph, which the ladder
  * doesn't derive — so this probe measures the operator on DETERMINISTIC
  * synthetic graphs of growing size: edge e of E has
  * src = e mod N, dst = Knuth-scatter(e) mod N (a random-ish directed
  * graph with mild in-degree skew — the shape, not the data, is what the
  * rung measures; the SkewProbe precedent). 3 iterations, the registered
  * queries' configuration.
  *
  * What the exponent proves: per-iteration cost is one edge×rank join +
  * one edge-sized map-side-combined aggregation + a node-frame
  * checkpoint — all linear structures; a super-linear exponent would
  * mean the iteration loop re-executes prior rounds (the lineage-
  * truncation failure this operator's checkpoint discipline exists to
  * prevent).
  *
  * Usage: `runMain graft.GraphLadder [edgesBase]` (default 200k edges at
  * ×1, nodes = edges/10). Writes scaling_r11_pagerank.json.
  */
object GraphLadder {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val knuth = 2654435761L
    val prime = 999999937L
    def run(factor: Int): Double = {
      val edges = base * factor
      val nodes = math.max(edges / 10, 100L)
      val e = spark.range(edges).select(
        pmod(col("id"), lit(nodes)).as("src"),
        pmod(pmod(col("id") * knuth, lit(prime)), lit(nodes)).as("dst"))
      val t0 = System.nanoTime()
      graft.graph.PageRank.ranks(e, "src", "dst", iterations = 3)
        .queryExecution.toRdd.count(): Unit
      (System.nanoTime() - t0) / 1e9
    }

    val factors = Seq(1, 4, 16, 64)
    val times = factors.map { f =>
      run(f) // warm-up at each size (codegen, JIT)
      System.gc()
      val t = (1 to 2).map(_ => run(f)).min
      println(s"[graph-ladder] x$f edges=${base * f} sec=$t")
      f -> t
    }
    val exp = {
      // least-squares slope of ln t vs ln f over factors >= 4
      val pts = times.filter(_._1 >= 4)
        .map { case (f, t) => (math.log(f.toDouble), math.log(t)) }
      val n = pts.size
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxx = pts.map(p => p._1 * p._1).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      (n * sxy - sx * sy) / (n * sxx - sx * sx)
    }
    val json = times.map { case (f, t) => s""""x$f": ${f"$t%.3f"}""" }
      .mkString("{", ", ", "}")
    val out = s"""{"metric": "pagerank_ladder", "edges_base": $base, """ +
      s""""iterations": 3, "times": $json, "exponent": ${f"$exp%.3f"}}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("scaling_r11_pagerank.json"), out + "\n")
    println(out)
    spark.stop()
  }
}
