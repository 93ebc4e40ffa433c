package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Handed-codebook product quantization — the [[KMeansLloyd]] discipline
  * applied to [[Pq]]'s ADC scan: the production PQ lanes are rows-only
  * because their codebooks come from sampled-seed Lloyd training (xxhash64
  * sample ranks); HERE the per-subspace codebooks are HANDED Walsh ±0.125
  * sign patterns (exactly representable, distinct per subspace by index
  * offset), so an external engine replays the ENTIRE route: every
  * subspace assignment's distances and argmin (the ENCODE), every query's
  * per-(subspace, code) lookup table (the LUT), and every candidate's
  * ADC sum and rank (the SCAN) — the asymmetric-distance algebra the
  * production lanes execute, oracle-pinned end to end.
  *
  * Cross-engine exactness, same ladder as the Lloyd walk:
  *  - coordinates enter as 6dp-dround'd doubles (exact decimals);
  *  - per-dim squared differences dround to 10dp and accumulate as exact
  *    DECIMAL(38,10) per (row, subspace, code) — subspace distances are
  *    order-independent decimal sums;
  *  - encode argmin and LUT share ONE distance chain; ties break on the
  *    lowest code id (min over a (d, code) struct);
  *  - the ADC score is the sum of m exact decimals — no float enters
  *    until the final 6dp display round;
  *  - ranking breaks ties on the lowest neighbor id.
  *
  * Scale shape (identical to [[Pq]]'s production geometry): the codebook
  * is a broadcast literal (m·ks·ds doubles); encode is one corpus×ks
  * map-side-combined aggregation per subspace slice; the LUT frame is
  * queries×m×ks (dimension-sized); the ADC scan joins codes to the
  * broadcast LUT on (subspace, code) and collapses map-side to one row
  * per (query, candidate). The corpus never sorts.
  */
object PqHanded {

  /** Per-subspace handed codebooks: subspace `mi` uses Walsh patterns
    * mi+1 … mi+ks over `ds` coordinates — distinct codebooks per
    * subspace from one deterministic family. Rows: (subspace, code,
    * within-subspace pos, coordinate). */
  def codebook(m: Int, ks: Int, ds: Int): Seq[(Int, Int, Int, Double)] = {
    val pats = KMeansLloyd.walshInit(m + ks, ds)
    for {
      mi <- 0 until m
      c <- 0 until ks
      (x, pos) <- pats(mi + c).zipWithIndex
    } yield (mi, c, pos, x)
  }

  private def cbFrame(df: DataFrame, m: Int, ks: Int, ds: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    codebook(m, ks, ds).toDF("_gf_m", "_gf_c", "_gf_sp", "_gf_v")
  }

  /** Melted 6dp coordinate frame with subspace split:
    * (id, subspace, within-subspace pos, x). */
  private def melted(df: DataFrame, idCol: String, vecCol: String,
                     ds: Int): DataFrame =
    df.where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("_gf_id"),
        posexplode(col(vecCol)).as(Seq("_gf_pos", "_gf_xf")))
      .select(col("_gf_id"),
        expr(s"_gf_pos div $ds").as("_gf_m"),
        pmod(col("_gf_pos"), lit(ds)).as("_gf_sp"),
        graft.Num.dround(col("_gf_xf").cast(DoubleType), 6).as("_gf_x"))

  /** The shared distance chain: (id, subspace, code, d DECIMAL(38,10)). */
  private def dists(pts: DataFrame, cb: DataFrame): DataFrame = {
    val term = graft.Num.dround(
      (col("_gf_x") - col("_gf_v")) * (col("_gf_x") - col("_gf_v")), 10)
    pts.join(broadcast(cb), Seq("_gf_m", "_gf_sp"))
      .groupBy(col("_gf_id"), col("_gf_m"), col("_gf_c"))
      .agg(sum(term.cast(DecimalType(38, 10))).as("_gf_d"))
  }

  /** Encode: one code per (row, subspace) — argmin over the ks codebook
    * entries, lowest code on ties. Output (id, subspace, code). */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             m: Int, ks: Int, ds: Int): DataFrame =
    dists(melted(df, idCol, vecCol, ds), cbFrame(df, m, ks, ds))
      .groupBy("_gf_id", "_gf_m")
      .agg(min(struct(col("_gf_d"), col("_gf_c"))).getField("_gf_c").as("_gf_code"))

  /** Query LUT: every (query, subspace, code) distance — the per-query
    * m×ks table the ADC scan reads. */
  def lut(queries: DataFrame, idCol: String, vecCol: String,
          m: Int, ks: Int, ds: Int): DataFrame =
    dists(melted(queries, idCol, vecCol, ds), cbFrame(queries, m, ks, ds))
      .select(col("_gf_id").as("_gf_qid"), col("_gf_m"),
        col("_gf_c"), col("_gf_d"))

  /** ADC top-k of `queries` against `corpus` (optionally pre-filtered to
    * `candidates(query_id, neighbor_id)` — the IVFADC composition; pairs
    * must be UNIQUE, which an IVF cell map guarantees since every vector
    * lives in exactly one cell). The candidate filter applies BEFORE the
    * scan — the scan's cost is |pairs|·m rows, and pruning after would
    * forfeit exactly the work IVF exists to save.
    * Output (query_id, neighbor_id, rank, adc 6dp). */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String,
           vecCol: String, m: Int, ks: Int, ds: Int, k: Int,
           candidates: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val codes = encode(corpus, idCol, vecCol, m, ks, ds)
    val l = lut(queries, idCol, vecCol, m, ks, ds)
    val pairs = candidates match {
      case Some(c) =>
        c.join(codes, c("neighbor_id") === codes("_gf_id"))
          .join(broadcast(l),
            col("query_id") === col("_gf_qid") &&
              codes("_gf_m") === l("_gf_m") &&
              col("_gf_code") === col("_gf_c"))
          .groupBy(col("query_id"), col("neighbor_id"))
          .agg(sum(col("_gf_d")).as("_gf_adc"))
      case None =>
        codes.join(broadcast(l),
            codes("_gf_m") === l("_gf_m") && col("_gf_code") === col("_gf_c"))
          .groupBy(col("_gf_qid").as("query_id"), col("_gf_id").as("neighbor_id"))
          .agg(sum(col("_gf_d")).as("_gf_adc"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("_gf_adc"), col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("int").as("rank"),
        graft.Num.dround(col("_gf_adc").cast(DoubleType), 6).as("adc"))
  }

  // ---- DuckDB mirror -------------------------------------------------

  /** SQL literal VALUES relation (m, c, sp, v) for [[codebook]]. */
  def sqlCodebook(m: Int, ks: Int, ds: Int): String =
    codebook(m, ks, ds).map { case (mi, c, sp, x) =>
      s"($mi, $c, $sp, CAST($x AS DOUBLE))"
    }.mkString("(VALUES ", ", ", ")")

  /** CTE chain over `rel(vec_id, embedding)`: ends in
    * `pqcodes(vid, m, code)` plus the shared `pqcb` codebook — the
    * ENCODE replay. */
  def sqlEncodeCtes(rel: String, m: Int, ks: Int, ds: Int): String =
    s"""pqcb AS (SELECT * FROM ${sqlCodebook(m, ks, ds)} AS t(m, c, sp, v)),
       pqpts AS (
         SELECT vec_id AS vid, CAST(pos AS INT) // $ds AS m,
                CAST(pos AS INT) % $ds AS sp,
                floor(CAST(xf AS DOUBLE) * 1e6 + 0.5) / 1e6 AS x
         FROM (SELECT vec_id, unnest(embedding) AS xf,
                      unnest(range(len(embedding))) AS pos
               FROM $rel WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)),
       pqd AS (
         SELECT p.vid, p.m, c.c,
                sum(CAST(floor((p.x - c.v) * (p.x - c.v) * 1e10 + 0.5) / 1e10
                     AS DECIMAL(38,10))) AS d
         FROM pqpts p JOIN pqcb c ON c.m = p.m AND c.sp = p.sp
         GROUP BY 1, 2, 3),
       pqcodes AS (
         SELECT vid, m, c AS code FROM (
           SELECT vid, m, c,
                  row_number() OVER (PARTITION BY vid, m ORDER BY d, c) AS rn
           FROM pqd) t WHERE rn = 1)"""

  /** CTE chain over `qrel(vec_id, embedding)` (must FOLLOW
    * [[sqlEncodeCtes]] — reuses `pqcb`): ends in `pqlut(qid, m, c, d)`. */
  def sqlLutCtes(qrel: String, ds: Int): String =
    s"""pqqpts AS (
         SELECT vec_id AS qid, CAST(pos AS INT) // $ds AS m,
                CAST(pos AS INT) % $ds AS sp,
                floor(CAST(xf AS DOUBLE) * 1e6 + 0.5) / 1e6 AS x
         FROM (SELECT vec_id, unnest(embedding) AS xf,
                      unnest(range(len(embedding))) AS pos
               FROM $qrel WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)),
       pqlut AS (
         SELECT p.qid, p.m, c.c,
                sum(CAST(floor((p.x - c.v) * (p.x - c.v) * 1e10 + 0.5) / 1e10
                     AS DECIMAL(38,10))) AS d
         FROM pqqpts p JOIN pqcb c ON c.m = p.m AND c.sp = p.sp
         GROUP BY 1, 2, 3)"""

  /** ADC scan + rank over `pqcodes`/`pqlut` (optionally scoped to a
    * candidate CTE `cand(query_id, neighbor_id)` of unique pairs — the
    * IVFADC composition): the final SELECT. */
  def sqlAdcSelect(k: Int, candRel: Option[String] = None): String = {
    val scan = candRel match {
      case Some(r) =>
        s"""SELECT cd.query_id AS qid, cd.neighbor_id AS vid, sum(l.d) AS adc
           FROM $r cd
           JOIN pqcodes s ON s.vid = cd.neighbor_id
           JOIN pqlut l ON l.qid = cd.query_id AND l.m = s.m AND l.c = s.code
           GROUP BY 1, 2"""
      case None =>
        s"""SELECT l.qid, s.vid, sum(l.d) AS adc
           FROM pqcodes s JOIN pqlut l ON l.m = s.m AND l.c = s.code
           GROUP BY 1, 2"""
    }
    s"""SELECT query_id, neighbor_id, rank,
              floor(CAST(adc AS DOUBLE) * 1e6 + 0.5) / 1e6 AS adc
       FROM (
         SELECT qid AS query_id, vid AS neighbor_id,
                CAST(row_number() OVER (PARTITION BY qid
                  ORDER BY adc, vid) AS INT) AS rank, adc
         FROM ($scan) sums) ranked
       WHERE rank <= $k"""
  }
}
