package graft.sim

import graft.ops.Quota
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cluster-balanced (diversity) sampling — cap how many rows survive per
  * embedding-space cluster, so a training mix keeps its semantic spread
  * instead of letting a few dominant modes (boilerplate clusters, template
  * pages, one over-crawled topic) swamp everything else. This is the
  * embedding-space twin of the per-source quota (SURVEY row 65): rows 45-49
  * dedup what is NEARLY IDENTICAL; this caps what is merely ABUNDANT.
  *
  * No reference analogue (the reference has no vector operations); the
  * technique is the standard cluster-then-cap curation step described in
  * public corpus-curation work (e.g. the SemDedup paper's cluster stage,
  * arXiv:2303.09540, reused here for balance instead of dedup).
  *
  * Spark shape, 100 TB-first — a composition of two already-scale-audited
  * pieces, no new moving parts:
  *  - cluster assignment is [[Ivf]]'s fine-cell quantizer: centroids are
  *    dimension-sized (the only collected state), assignment is a broadcast
  *    join + map-side-combining min-aggregate over the corpus;
  *  - the per-cluster cap is [[graft.ops.Quota.capPerGroupAuto]]: one
  *    hash-partition shuffle on the cluster id + a sort-based window,
  *    deterministic hash-ranked winners, and the pre-thin skew route picked
  *    automatically — which matters HERE more than for source quotas,
  *    because k-means on web-scale text routinely produces one giant
  *    boilerplate cell that would otherwise own a single reducer.
  */
object ClusterBalance {

  /** Keep at most `perCluster` rows from each of `clusters` embedding
    * cells. Returns (cluster_id, `idCol`) for the surviving rows —
    * dimension-stable output (join back to the corpus on `idCol` for the
    * payload; keeping the full row here would force the window to carry
    * every column through the shuffle).
    *
    * Deterministic end-to-end: Ivf's k-means seeds by hash rank, the cap
    * ranks by the Knuth fold — same corpus + same params = same kept set,
    * across runs, retries, and partitionings. */
  def sample(corpus: DataFrame, idCol: String, vecCol: String,
             clusters: Int, perCluster: Int, iters: Int = 2,
             seed: Long = 0L): DataFrame = {
    require(clusters >= 1, s"clusters=$clusters must be >= 1")
    require(perCluster >= 1, s"perCluster=$perCluster must be >= 1")
    val index = Ivf.train(corpus, idCol, vecCol, k = clusters, iters = iters)
    val assigned = index.indexed
      .select(col("_gf_cid").as("cluster_id"), col("_gf_id").as(idCol))
    Quota.capPerGroupAuto(assigned, "cluster_id", idCol, perCluster, seed)
  }
}
