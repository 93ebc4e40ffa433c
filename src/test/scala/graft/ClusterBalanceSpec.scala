package graft

import graft.sim.{ClusterBalance, Ivf}
import org.apache.spark.sql.functions._

/** Pins cluster-balanced sampling ([[graft.sim.ClusterBalance]]): exact
  * per-cluster cap semantics against an independently recomputed
  * assignment, and end-to-end determinism. */
class ClusterBalanceSpec extends SparkSpec {

  test("every cluster keeps exactly min(n, cluster size) rows") {
    val e = Tables.embeddings(spark, sfDir)
    val n = 20
    val kept = ClusterBalance.sample(e, "vec_id", "embedding",
      clusters = 8, perCluster = n, iters = 2)
    // the trainer is deterministic (hash-ranked seeds), so re-training
    // with the same params reproduces the assignment independently
    val index = Ivf.train(e, "vec_id", "embedding", k = 8, iters = 2)
    val sizes = index.indexed.groupBy(col("_gf_cid").as("cluster_id"))
      .agg(count(lit(1)).as("total"))
    val keptSizes = kept.groupBy("cluster_id")
      .agg(count(lit(1)).as("kept"))
    val joined = sizes.join(keptSizes, Seq("cluster_id"), "left")
      .select(col("cluster_id"), col("total"),
        coalesce(col("kept"), lit(0L)).as("kept"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val total = r.getLong(1); val k = r.getLong(2)
      assert(k == math.min(n.toLong, total),
        s"cluster ${r.getLong(0)}: kept $k of $total with cap $n")
    }
    // at least one cluster actually hit the cap, or the fixture is vacuous
    assert(joined.exists(_.getLong(1) > n))
    // and every kept (cluster, id) pair is a real assignment pair
    val pairHits = kept.join(
      index.indexed.select(col("_gf_cid").as("cluster_id"),
        col("_gf_id").as("vec_id")),
      Seq("cluster_id", "vec_id")).count()
    assert(pairHits == kept.count())
  }

  test("the kept set is identical across invocations") {
    val e = Tables.embeddings(spark, sfDir)
    def run() = ClusterBalance.sample(e, "vec_id", "embedding",
        clusters = 8, perCluster = 10, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = run(); val b = run()
    assert(a == b)
    assert(a.nonEmpty)
  }
}
