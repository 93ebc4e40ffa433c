package graft.sim

import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVFADC — the composition of [[Ivf]] cell pruning with [[Pq]] code
  * compression (Jégou et al., TPAMI 2011, §V: "IVFADC"), the canonical
  * billion-vector ANN layout: the inverted file decides WHICH rows a
  * query scores (nprobe cells instead of the whole corpus) and product
  * quantization decides HOW MUCH each scored row costs (m byte-code adds
  * instead of a D-dim float walk). With both levers a probe touches
  * `corpus × nprobe/K` rows at `m` adds each — the only corpus-sized
  * artifact in memory is the (cid, id, code) table at ~(8+8+m) bytes per
  * vector.
  *
  * [[build]] co-locates each vector's PQ code with its IVF cell id — ONE
  * equi-join at index-build time, the analogue of writing codes into the
  * inverted lists. At 100 TB this frame is what you persist, partitioned
  * by `_gf_cid` exactly like [[Ivf.writeIndex]] partitions the raw
  * vectors, so a probe's static IN filter partition-prunes to the probed
  * cells' code files; the probe-side machinery (single-collect probe
  * subplan, broadcast LocalRelation, manifest-validated dims) is
  * inherited unchanged from [[Ivf.collectProbes]] / [[Pq.lutFrame]].
  *
  * Note the codes quantize the ORIGINAL vectors, not cell residuals: the
  * ADC estimate is cell-independent, so recall loss comes only from
  * pruning (unprobed cells) and quantization (codebook resolution) — and
  * probing ALL cells recovers [[Pq.topK]]'s full-scan result exactly
  * (pinned in PqSpec). Residual encoding (paper §V.A) would sharpen the
  * estimate per cell at the cost of Kc× codebook state; this engine
  * keeps the simpler layout and spends `ks`/`m` for accuracy instead. */
object IvfPq {

  /** `coCodes`: corpus rows (_gf_cid, _gf_id, _gf_code) — the inverted
    * lists with byte codes in place of vectors. */
  final case class IvfPqIndex(ivf: Ivf.IvfIndex, pq: Pq.PqIndex,
                              coCodes: DataFrame)

  /** Join each vector's fine cell id with its PQ code (one build-time
    * shuffle on the id) and cache the result — the compressed inverted
    * file every probe scans. Both inputs must come from the same corpus:
    * a row present in one index but not the other is index corruption,
    * and the inner join would silently drop it — so build COUNTS both
    * sides and raises on mismatch (one extra pair of count jobs at build
    * time, on the same cached frames the join reads anyway). */
  def build(ivf: Ivf.IvfIndex, pq: Pq.PqIndex): IvfPqIndex = {
    val cells = ivf.indexed.select(col("_gf_cid"), col("_gf_id"))
    val coCodes = cells.join(pq.codes, Seq("_gf_id"))
      .select(col("_gf_cid"), col("_gf_id"), col("_gf_code"))
      .cache()
    // both directions: a SUBSET index joins cleanly against the larger
    // one, so comparing the join count to only one side would miss it
    val joined = coCodes.count()
    val nPq = pq.codes.count()
    val nIvf = cells.count()
    if (joined != nPq || joined != nIvf) throw new IllegalArgumentException(
      s"IvfPq.build: IVF and PQ indexes disagree — $nIvf cell-assigned " +
        s"vectors, $nPq coded vectors, $joined joined rows; the indexes " +
        "were not built from the same corpus (or ids collide)")
    IvfPqIndex(ivf, pq, coCodes)
  }

  /** The shared ADC scan: probe subplan collected ONCE upstream, (qid,
    * cid) pairs and per-query LUTs broadcast, `coCodes` pruned to the
    * probed cells — returns (_gf_qid, _gf_id, _gf_cos) with the ADC
    * cosine estimate, un-ranked. Both [[topK]] and [[topKRerank]] consume
    * it; only what happens AFTER the estimate differs. */
  private def adcScored(index: IvfPqIndex,
      probeRows: Array[org.apache.spark.sql.Row],
      probeSchema: org.apache.spark.sql.types.StructType,
      luts: DataFrame): DataFrame = {
    val spark = index.coCodes.sparkSession
    val cidIdx = probeSchema.fieldIndex("_gf_cid")
    val qidIdx = probeSchema.fieldIndex("_gf_qid")
    val probedCids = probeRows.map(_.getLong(cidIdx)).distinct.toSeq
    // (qid, cid) probe pairs as a LocalRelation — the query vector stays
    // out of the scan side; the LUT already encodes it
    val pairSchema = org.apache.spark.sql.types.StructType(
      Seq(probeSchema(qidIdx), probeSchema(cidIdx)))
    val pairRows = probeRows.map(r =>
      org.apache.spark.sql.Row(r.get(qidIdx), r.getLong(cidIdx)))
    val pairs = spark.createDataFrame(
      java.util.Arrays.asList(pairRows: _*), pairSchema)
    val pruned =
      if (probedCids.isEmpty) index.coCodes.filter(lit(false))
      else index.coCodes.filter(col("_gf_cid").isin(probedCids: _*))
    pruned.join(broadcast(pairs), Seq("_gf_cid"))
      .join(broadcast(luts), Seq("_gf_qid"))
      .withColumn("_gf_cos",
        lit(1.0) - GraftFunctions.pqAdcSum(col("_gf_code"), col("_gf_lut"),
          index.pq.meta.ks) / 2)
      .select(col("_gf_qid"), col("_gf_id"), col("_gf_cos"))
  }

  /** Top-k by ADC over the probed cells only. CONTRACT (as [[Ivf.topK]]):
    * `queries` is a dimension-sized batch. The probe subplan runs once
    * (collected), the LUT frame is queries-sized (broadcast), and the
    * scan side is the `coCodes` rows of the probed cells — everything
    * else is never read. */
  def topK(index: IvfPqIndex, queries: DataFrame, queryId: String,
           queryVec: String, k: Int = 10, nprobe: Int = 4): DataFrame = {
    val (probeRows, probeSchema) =
      Ivf.collectProbes(index.ivf, queries, queryId, queryVec, nprobe)
    val luts = Pq.lutFrame(index.pq, queries, queryId, queryVec)
    val w = Window.partitionBy("_gf_qid")
      .orderBy(col("_gf_cos").desc, col("_gf_id"))
    adcScored(index, probeRows, probeSchema, luts)
      .withColumn("_gf_rank", row_number().over(w))
      .filter(col("_gf_rank") <= k)
      .select(col("_gf_qid").as("query_id"), col("_gf_id").as("neighbor_id"),
        col("_gf_rank").as("rank"),
        graft.Num.dround(col("_gf_cos"), 6).as("adc_cosine"))
  }

  /** IVFADC with exact re-ranking (the paper's §VI refinement, a.k.a.
    * IVFADC+R): the ADC estimate picks a SHORTLIST of `shortlist`
    * candidates per query (default 4·k), then only those rows' ORIGINAL
    * vectors are fetched and re-scored with the exact [[graft.functions.VecCosine]],
    * and the final top-k ranks on the exact value. This buys back the
    * quantization error at a bounded exact-distance cost — per query,
    * `shortlist` float walks instead of the whole probed set — and is the
    * standard production layout: byte codes decide who gets an exact
    * look, floats decide the answer.
    *
    * Scale shape: the exact pass joins the (queries × shortlist)-sized
    * candidate list (broadcast) against the cid-pruned `indexed` corpus
    * — the SAME static IN filter as the code scan, so a persisted index
    * partition-prunes both passes and the unprobed corpus is never read
    * in either representation. Query vectors re-enter via a second
    * dimension-sized broadcast derived from the already-collected probe
    * rows (no re-execution of the probe subplan).
    *
    * If the shortlist covers every probed candidate, the result is the
    * EXACT cosine ranking of the probed set — recall can only improve
    * over [[topK]]'s ADC ranking of the same set (pinned in IvfPqSpec);
    * with every cell probed it equals brute force exactly. */
  def topKRerank(index: IvfPqIndex, queries: DataFrame, queryId: String,
                 queryVec: String, k: Int = 10, nprobe: Int = 4,
                 shortlist: Int = 0): DataFrame = {
    val spark = queries.sparkSession
    val r = if (shortlist > 0) math.max(shortlist, k) else 4 * k
    val (probeRows, probeSchema) =
      Ivf.collectProbes(index.ivf, queries, queryId, queryVec, nprobe)
    val luts = Pq.lutFrame(index.pq, queries, queryId, queryVec)
    val shortW = Window.partitionBy("_gf_qid")
      .orderBy(col("_gf_cos").desc, col("_gf_id"))
    val short = adcScored(index, probeRows, probeSchema, luts)
      .withColumn("_gf_rank", row_number().over(shortW))
      .filter(col("_gf_rank") <= r)
      .select(col("_gf_qid"), col("_gf_id"))
    // exact query vectors from the SAME collected probe rows (one row per
    // (qid, probed cell) — distinct to one per qid), broadcast
    val qidIdx = probeSchema.fieldIndex("_gf_qid")
    val qvIdx = probeSchema.fieldIndex("_gf_qv")
    val qSchema = org.apache.spark.sql.types.StructType(
      Seq(probeSchema(qidIdx), probeSchema(qvIdx)))
    val qRows = probeRows.map(pr => (pr.get(qidIdx), pr.get(qvIdx)))
      .distinct.map(t => org.apache.spark.sql.Row(t._1, t._2))
    val qvecs = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), qSchema)
    val cidIdx = probeSchema.fieldIndex("_gf_cid")
    val probedCids = probeRows.map(_.getLong(cidIdx)).distinct.toSeq
    val prunedVecs =
      if (probedCids.isEmpty) index.ivf.indexed.filter(lit(false))
      else index.ivf.indexed.filter(col("_gf_cid").isin(probedCids: _*))
    val w = Window.partitionBy("_gf_qid")
      .orderBy(col("_gf_cos").desc, col("_gf_id"))
    prunedVecs.select(col("_gf_id"), col("_gf_v"))
      .join(broadcast(short), Seq("_gf_id"))
      .join(broadcast(qvecs), Seq("_gf_qid"))
      .withColumn("_gf_cos", GraftFunctions.vecCosine(col("_gf_v"), col("_gf_qv")))
      .withColumn("_gf_rank", row_number().over(w))
      .filter(col("_gf_rank") <= k)
      .select(col("_gf_qid").as("query_id"), col("_gf_id").as("neighbor_id"),
        col("_gf_rank").as("rank"),
        graft.Num.dround(col("_gf_cos"), 6).as("cosine"))
  }
}
