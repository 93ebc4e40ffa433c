package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-component labelling over a near-duplicate pair list, and the
  * keep-one-per-component dedup policy built on it (the standard corpus
  * policy: a chain A~B~C with A≁C is still ONE component, so greedy
  * pair-based dropping — MinHash.dedup — can keep two of its docs).
  *
  * Algorithm: iterative min-label propagation over the edge list. Each
  * round every node takes the minimum label among itself and its
  * neighbours; convergence needs O(component diameter) rounds. Everything
  * is joins + groupBy on (id, label) longs — no driver-side graph, no
  * vertex set collected — so it scales to corpus-sized pair lists. Lineage
  * is truncated per round with localCheckpoint (iterative plans otherwise
  * grow exponentially and re-execute prior rounds).
  *
  * Near-dup chains in a real corpus are shallow (near-dup similarity is
  * near-transitive), so the default round cap of 50 covers diameters no
  * real pair list reaches; the loop exits early as soon as a round changes
  * nothing.
  */
object Components {

  /** Truncate lineage between rounds: a RELIABLE checkpoint when the
    * session has a checkpoint dir (survives executor loss — required on a
    * real cluster), else an eager localCheckpoint (fine on local[n],
    * where executor loss means the app is gone anyway). */
  private def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(true)
    else df.localCheckpoint(true)

  /** Component label per node id appearing in `pairs` (id_a, id_b):
    * (id, component) where component = min node id reachable through the
    * pair graph. Nodes not present in any pair are not returned (their
    * component is trivially themselves). */
  /** Best-effort removal of an intermediate frame's RELIABLE checkpoint
    * files once nothing downstream can reference them (the successor
    * round is already materialized into its own checkpoint). Without
    * this, every round leaks a full copy of the node set to the
    * checkpoint dir (`spark.cleaner...cleanCheckpoints` defaults off).
    *
    * The checkpointed RDD must be taken from the `LogicalRDD` leaf that
    * `df.checkpoint(true)` produced — `queryExecution.toRdd` returns a
    * fresh projection RDD *derived* from it, whose `getCheckpointFile`
    * is always None (so deleting via toRdd would silently never fire). */
  private def dropCheckpoint(df: DataFrame): Unit =
    try {
      val files = df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.getCheckpointFile
      }.flatten
      files.foreach { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        path.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          .delete(path, true): Unit
      }
    } catch { case scala.util.control.NonFatal(_) => () }

  def componentLabels(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // Undirected edge list: both directions, deduped.
    val fwd = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    val rev = pairs.select(col("id_b").as("src"), col("id_a").as("dst"))
    val edges = truncate(fwd.union(rev).distinct())

    var labels = truncate(edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")))
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // Propose each neighbour's current label to src, keep the minimum.
      val proposals = edges.join(labels, edges("dst") === labels("id"))
        .select(col("src").as("id"), col("label"))
      val next = truncate(labels.union(proposals)
        .groupBy("id").agg(min("label").as("label")))
      changed = next.join(labels.withColumnRenamed("label", "_gf_old"), "id")
        .filter(col("label") =!= col("_gf_old")).count()
      dropCheckpoint(labels)
      labels = next
      iter += 1
    }
    dropCheckpoint(edges)
    // Silent partial labels would let duplicates survive the
    // keep-one-per-component policy — refuse instead.
    if (changed > 0) throw new IllegalStateException(
      s"componentLabels did not converge in $maxIter rounds ($changed labels still changing) — " +
        "the pair graph has a component with diameter > maxIter; raise maxIter")
    labels.select(col("id"), col("label").as("component"))
  }

  /** Keep exactly one document (the min-id representative) per connected
    * component of the near-dup pair graph; docs in no pair are kept. */
  def dedupByComponent(df: DataFrame, idCol: String,
                       pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val losers = componentLabels(pairs, maxIter)
      .filter(col("component") =!= col("id"))
      .select(col("id").as("_gf_loser"))
    df.join(losers, df(idCol) === col("_gf_loser"), "left_anti")
  }
}
