package graft.sim

import graft.dedup.Components
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDedup-style semantic deduplication: cluster embeddings with the IVF
  * coarse quantizer, find within-cluster pairs above a cosine threshold,
  * and keep one representative (min id) per connected component of the
  * pair graph — the embedding-space analogue of MinHash+components for
  * text (see Abbas et al., "SemDeDup", 2023, for the published recipe this
  * follows: k-means cells + within-cell cosine pruning).
  *
  * Scale shape: the candidate set is the per-cluster self-join, so the
  * shuffle key is the cluster id and only same-cell pairs pay a cosine.
  * Cost is O(n · cellSize) when `k` is sized so cells hold a bounded
  * number of vectors — size `k ≈ n / targetCell` exactly like
  * [[Similarity.adaptivePlanes]] sizes sign bits; a fixed small `k` at
  * growing n degenerates quadratically. Pairs whose members quantize into
  * different cells are missed (recall < 1) — the standard trade; raise
  * recall with more Lloyd iterations or a multi-probe variant.
  */
object SemDedup {

  /** Within-cell candidate pairs with exact cosine >= threshold
    * (id_a < id_b), over a trained [[Ivf.IvfIndex]]. `probes > 1` tags
    * each vector with its `probes` nearest cells before the self-join —
    * the multi-probe recall lever for pairs that quantize across a cell
    * boundary (candidate volume multiplies by ~probes², each surviving
    * pair still pays exactly one cosine). */
  def pairs(index: Ivf.IvfIndex, threshold: Double,
            probes: Int = 1): DataFrame = {
    if (probes <= 1) {
      // single-probe: vectors ride the cell self-join, each pair seen once
      val a = index.indexed.select(col("_gf_cid"), col("_gf_id").as("id_a"),
        col("_gf_v").as("_gf_va"))
      val b = index.indexed.select(col("_gf_cid"), col("_gf_id").as("id_b"),
        col("_gf_v").as("_gf_vb"))
      a.join(b, Seq("_gf_cid"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.Num.dround(Similarity.cosine(col("_gf_va"), col("_gf_vb")), 6).as("cosine"))
        .filter(col("cosine") >= threshold)
    } else {
      // multi-probe surfaces one pair from several shared cells: dedup
      // ID-ONLY candidates (an 8-byte pair key, not two dim-length vector
      // copies, through the shuffle) and join the vectors back by id for
      // exactly one cosine per surviving pair
      val ids = Ivf.assignProbes(index, probes).select("_gf_cid", "_gf_id")
      val candIds = ids.select(col("_gf_cid"), col("_gf_id").as("id_a"))
        .join(ids.select(col("_gf_cid"), col("_gf_id").as("id_b")), Seq("_gf_cid"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates("id_a", "id_b")
      val vecs = index.indexed.select(col("_gf_id"), col("_gf_v"))
      candIds
        .join(vecs.select(col("_gf_id").as("id_a"), col("_gf_v").as("_gf_va")),
          Seq("id_a"))
        .join(vecs.select(col("_gf_id").as("id_b"), col("_gf_v").as("_gf_vb")),
          Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          graft.Num.dround(Similarity.cosine(col("_gf_va"), col("_gf_vb")), 6).as("cosine"))
        .filter(col("cosine") >= threshold)
    }
  }

  /** Semantic decontamination: corpus items whose embedding sits at
    * cosine >= `threshold` to ANY benchmark item — the embedding-space
    * complement of the n-gram/MinHash decontamination routes, catching
    * REWORDED contamination that shares no 8-gram and no MinHash band.
    * Composes the [[Ivf]] cells with the cross-corpus shape of
    * `MinHash.decontaminateNear`: the index trains on the CORPUS, the
    * benchmark (dimension-sized by the decontamination contract — it is
    * a benchmark, not a second corpus) probes its `nprobe` nearest cells
    * through the single-collect probe plan, and only same-cell
    * (corpus, bench) pairs pay one exact cosine. Returns contaminated
    * corpus ids with their best bench match (ties break to the larger
    * bench id — deterministic).
    *
    * 100 TB: corpus vectors never leave their cell partitioning; the
    * probe frame is benchmark×nprobe rows, broadcast; driver traffic is
    * O(bench × nprobe). Recall is the IVF cell trade — raise `nprobe`
    * for boundary cases (the planted-clone class is immune: a scaled
    * clone shares its source's cell by construction). */
  def decontaminate(corpus: DataFrame, corpusId: String, corpusVec: String,
                    bench: DataFrame, benchId: String, benchVec: String,
                    k: Int, threshold: Double = 0.95, iters: Int = 2,
                    seed: Long = 42L, nprobe: Int = 4): DataFrame = {
    val index = Ivf.train(corpus, corpusId, corpusVec, k, iters, seed)
    val (probeRows, probeSchema) =
      Ivf.collectProbes(index, bench, benchId, benchVec, nprobe)
    val spark = corpus.sparkSession
    val probesLocal = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probeSchema)
    index.indexed.join(broadcast(probesLocal), Seq("_gf_cid"))
      .withColumn("_gf_cos",
        graft.Num.dround(Similarity.cosine(col("_gf_v"), col("_gf_qv")), 6))
      .filter(col("_gf_cos") >= threshold)
      .groupBy(col("_gf_id").as(corpusId))
      .agg(max(struct(col("_gf_cos"), col("_gf_qid"))).as("_gf_best"))
      .select(col(corpusId),
        col("_gf_best").getField("_gf_qid").as("bench_id"),
        col("_gf_best").getField("_gf_cos").as("cosine"))
  }

  /** [[decontaminate]] under an EXPLICIT LSH plane matrix — the
    * hash-green oracle lane (the `ann_lsh_handed` discipline): handed
    * planes with exactly-representable entries make the bucket bits and
    * the in-bucket cosine fully SQL-expressible, so the whole
    * bucket → probe → threshold → best-match machinery is DuckDB-
    * replayable while the k-means production route stays rows-only.
    * Corpus buckets once; bench is broadcast. */
  def decontaminateWithPlanes(corpus: DataFrame, corpusId: String,
                              corpusVec: String, bench: DataFrame,
                              benchId: String, benchVec: String,
                              planes: Seq[Array[Double]],
                              threshold: Double): DataFrame = {
    require(planes.nonEmpty, "decontaminateWithPlanes needs at least one plane")
    val cv = corpus.select(col(corpusId).as("_gf_id"), col(corpusVec).as("_gf_cv"))
    val qv = bench.select(col(benchId).as("_gf_qid"), col(benchVec).as("_gf_qv"))
    cv.withColumn("_gf_bucket", Similarity.bucketId(col("_gf_cv"), planes))
      .join(broadcast(qv.withColumn("_gf_bucket",
        Similarity.bucketId(col("_gf_qv"), planes))), Seq("_gf_bucket"))
      .withColumn("_gf_cos",
        graft.Num.dround(Similarity.cosine(col("_gf_cv"), col("_gf_qv")), 6))
      .filter(col("_gf_cos") >= threshold)
      .groupBy(col("_gf_id").as(corpusId))
      .agg(max(struct(col("_gf_cos"), col("_gf_qid"))).as("_gf_best"))
      .select(col(corpusId),
        col("_gf_best").getField("_gf_qid").as("bench_id"),
        col("_gf_best").getField("_gf_cos").as("cosine"))
  }

  /** Keep one representative per semantic-duplicate component: train a
    * `k`-cell index (`k <= 0` auto-sizes to n/targetCell — the documented
    * SemDedup cell rule), collect within-cell pairs above `threshold`,
    * label components, drop every non-min-id member. Vectors with no
    * near-duplicate are kept untouched. */
  def dedup(corpus: DataFrame, idCol: String, vecCol: String,
            k: Int, threshold: Double = 0.95, iters: Int = 2,
            seed: Long = 42L, probes: Int = 1): DataFrame = {
    val index = Ivf.train(corpus, idCol, vecCol, k, iters, seed)
    Components.dedupByComponent(corpus, idCol,
      pairs(index, threshold, probes).select("id_a", "id_b"))
  }
}
