package graft.sim

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the coarse-quantizer
  * scale path next to the random-hyperplane LSH in [[Similarity]].
  *
  * Spark-first shape:
  *  - **Train**: deterministic seed sample (top-K by `xxhash64(id, seed)`)
  *    + a few Lloyd rounds. Assignment is a PURE PROJECTION — the K
  *    centroids are broadcast as literals and the argmin is
  *    `array_min(array(struct(dist, cid)...))`, all inside whole-stage
  *    codegen (no crossJoin row multiplication, no shuffle). The centroid
  *    update is one `posexplode → groupBy(cid, pos) → avg` pass; only
  *    K×dim averages ever reach the driver (dimension-sized, like a
  *    master list).
  *  - **Index**: corpus tagged with its cluster id. At 100 TB you write
  *    this partitioned/bucketed by `cid` so a probe reads only the probed
  *    clusters' files.
  *  - **Query**: each query probes its `nprobe` nearest centroids, the
  *    probe list equi-joins the indexed corpus on `cid` (only probed
  *    clusters rerank — the inverted-file property), exact cosine rerank
  *    via the codegen'd [[graft.functions.VecCosine]], window top-k.
  *
  * Recall < 1 when a true neighbour's cluster is not probed — the
  * standard IVF trade; raise `nprobe` for recall, `k` (clusters) for
  * speed.
  */
object Ivf {

  final case class IvfIndex(centroids: Seq[Array[Float]], indexed: DataFrame)

  /** (1 - cosine) distances to every centroid as one codegen'd array of
    * (dist, cid) structs; `array_min` picks lexicographic min = argmin. */
  private def distStructs(vec: Column, centroids: Seq[Array[Float]]): Column =
    array(centroids.zipWithIndex.map { case (cv, ci) =>
      struct((lit(1.0) - GraftFunctions.vecCosine(vec, lit(cv))).as("d"),
        lit(ci).as("cid"))
    }: _*)

  private def nearestCid(vec: Column, centroids: Seq[Array[Float]]): Column =
    array_min(distStructs(vec, centroids)).getField("cid")

  /** Train a K-cluster index with `iters` Lloyd rounds (cosine geometry). */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int = 2, seed: Long = 42L): IvfIndex = {
    require(k > 0, s"k=$k clusters must be positive")
    corpus.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => ()
      case other => throw new IllegalArgumentException(
        s"Ivf.train expects $vecCol: array<float>, got ${other.simpleString} — " +
          "cast the embedding column first")
    }
    val base = corpus.select(col(idCol).as("_gf_id"), col(vecCol).as("_gf_v"))

    // deterministic seed sample: top-K by hash — uniform, reproducible
    var centroids: Seq[Array[Float]] = base
      .orderBy(xxhash64(col("_gf_id"), lit(seed)))
      .limit(k).select("_gf_v").collect()
      .map(_.getSeq[Float](0).toArray).toSeq

    for (_ <- 1 to iters) {
      val assigned = base.withColumn("_gf_cid", nearestCid(col("_gf_v"), centroids))
      val means = assigned
        .select(col("_gf_cid"), posexplode(col("_gf_v")).as(Seq("_gf_pos", "_gf_x")))
        .groupBy("_gf_cid", "_gf_pos")
        .agg(avg(col("_gf_x")).as("_gf_m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2).toFloat)
        }
      // empty clusters keep their previous centroid
      centroids = centroids.zipWithIndex.map { case (old, ci) =>
        means.get(ci).map(_.toArray).getOrElse(old)
      }
    }
    val indexed = base.withColumn("_gf_cid", nearestCid(col("_gf_v"), centroids))
    IvfIndex(centroids, indexed)
  }

  /** Top-k neighbours per query probing `nprobe` clusters. */
  def topK(index: IvfIndex, queries: DataFrame, queryId: String,
           queryVec: String, k: Int = 10, nprobe: Int = 4): DataFrame = {
    val probes = queries
      .select(col(queryId).as("_gf_qid"), col(queryVec).as("_gf_qv"),
        slice(array_sort(distStructs(col(queryVec), index.centroids)), 1,
          math.min(nprobe, index.centroids.size)).as("_gf_near"))
      .select(col("_gf_qid"), col("_gf_qv"),
        explode(col("_gf_near").getField("cid")).as("_gf_cid"))
    val w = Window.partitionBy("_gf_qid")
      .orderBy(col("_gf_cos").desc, col("_gf_id"))
    index.indexed.join(broadcast(probes), Seq("_gf_cid"))
      .withColumn("_gf_cos", GraftFunctions.vecCosine(col("_gf_v"), col("_gf_qv")))
      .withColumn("_gf_rank", row_number().over(w))
      .filter(col("_gf_rank") <= k)
      .select(col("_gf_qid").as("query_id"), col("_gf_id").as("neighbor_id"),
        col("_gf_rank").as("rank"), graft.Num.dround(col("_gf_cos"), 6).as("cosine"))
  }
}
