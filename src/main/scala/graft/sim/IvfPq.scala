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

  /** Top-k by ADC over the probed cells only. CONTRACT (as [[Ivf.topK]]):
    * `queries` is a dimension-sized batch. The probe subplan runs once
    * (collected), the LUT frame is queries-sized (broadcast), and the
    * scan side is the `coCodes` rows of the probed cells — everything
    * else is never read. */
  def topK(index: IvfPqIndex, queries: DataFrame, queryId: String,
           queryVec: String, k: Int = 10, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val (probeRows, probeSchema) =
      Ivf.collectProbes(index.ivf, queries, queryId, queryVec, nprobe)
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
    val luts = Pq.lutFrame(index.pq, queries, queryId, queryVec)
    val pruned =
      if (probedCids.isEmpty) index.coCodes.filter(lit(false))
      else index.coCodes.filter(col("_gf_cid").isin(probedCids: _*))
    val w = Window.partitionBy("_gf_qid")
      .orderBy(col("_gf_cos").desc, col("_gf_id"))
    pruned.join(broadcast(pairs), Seq("_gf_cid"))
      .join(broadcast(luts), Seq("_gf_qid"))
      .withColumn("_gf_cos",
        lit(1.0) - GraftFunctions.pqAdcSum(col("_gf_code"), col("_gf_lut"),
          index.pq.meta.ks) / 2)
      .withColumn("_gf_rank", row_number().over(w))
      .filter(col("_gf_rank") <= k)
      .select(col("_gf_qid").as("query_id"), col("_gf_id").as("neighbor_id"),
        col("_gf_rank").as("rank"),
        graft.Num.dround(col("_gf_cos"), 6).as("adc_cosine"))
  }
}
