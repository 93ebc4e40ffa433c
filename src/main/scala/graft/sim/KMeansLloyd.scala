package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Handed-initialization Lloyd walk — the k-means TRAINING LOOP itself
  * made oracle-replayable (the PageRank full-walk discipline applied to
  * clustering): every k-means-seeded lane in the index family is
  * rows-only because sampled seeds ride xxhash64; HERE the init is a
  * HANDED centroid set (callers pass it — the registry uses Walsh sign
  * patterns with entries ±0.125 = ±2⁻³, exactly representable), so an
  * external engine replays the ENTIRE walk: every assignment round's
  * distances, every argmin, every centroid update, iteration by
  * unrolled iteration. [[Ivf.train]]'s sampled-seed lanes stay the
  * production path; this lane pins the Lloyd arithmetic those lanes
  * execute.
  *
  * Cross-engine exactness, step by step:
  *  - coordinates enter as 6dp-dround'd doubles (exact decimals; the
  *    centroidDistances discipline);
  *  - per-dim squared differences dround to 10dp and accumulate as
  *    exact DECIMAL(38,10) — distances are order-independent sums both
  *    engines compute identically;
  *  - argmin breaks ties on the LOWEST cluster id (min over a (d, cid)
  *    struct — an explicit total order, no engine's grouping whim);
  *  - updates are exact-decimal means of the 6dp coordinates, 6dp
  *    dround'd — so the NEXT round's centroids are again exact
  *    decimals and the induction holds for any iteration count;
  *  - a cluster that loses all members keeps its previous centroid
  *    (the [[Ivf]] convention), replayed identically via the oracle's
  *    left join.
  *
  * Scale shape: per iteration one corpus×k distance aggregation
  * (map-side combined to one row per (vector, cluster) BEFORE the
  * argmin) and one (k·dim)-sized mean aggregation; centroids ride as a
  * broadcast literal/tiny frame; the corpus never sorts. k and iters
  * are small constants in every IVF/PQ training regime.
  */
object KMeansLloyd {

  /** The first `k` Walsh sign patterns over `dim` coordinates with
    * entries ±0.125 (exactly representable, mutually orthogonal) — the
    * registry's handed init. Pattern m flips sign by popcount(i & m). */
  def walshInit(k: Int, dim: Int): Seq[Seq[Double]] =
    (1 to k).map(m => (0 until dim).map(i =>
      if (java.lang.Integer.bitCount(i & m) % 2 == 0) 0.125 else -0.125))

  /** The shared walk core: (final centroid frame, final assignment with
    * exact-decimal squared distances). */
  private def walk(df: DataFrame, idCol: String, vecCol: String,
                   init: Seq[Seq[Double]], iters: Int)
      : (DataFrame, DataFrame) = {
    require(init.nonEmpty, "lloydWalk needs at least one init centroid")
    val dim = init.head.size
    require(init.forall(_.size == dim),
      "init centroids must share one dimensionality")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._

    // melted coordinate frame, 6dp exact decimals as doubles
    val pts = df
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("_gf_id"),
        posexplode(col(vecCol)).as(Seq("_gf_pos", "_gf_xf")))
      .select(col("_gf_id"), col("_gf_pos"),
        graft.Num.dround(col("_gf_xf").cast(DoubleType), 6).as("_gf_x"))

    def centroidFrame(cs: Seq[(Int, Seq[Double])]): DataFrame =
      cs.flatMap { case (cid, v) =>
        v.zipWithIndex.map { case (x, pos) => (cid, pos, x) }
      }.toDF("_gf_cid", "_gf_pos", "_gf_c")

    var centroids = centroidFrame(init.zipWithIndex.map(_.swap))

    def assign(cents: DataFrame): DataFrame = {
      val term = graft.Num.dround(
        (col("_gf_x") - col("_gf_c")) * (col("_gf_x") - col("_gf_c")), 10)
      pts.join(broadcast(cents), Seq("_gf_pos"))
        .groupBy(col("_gf_id"), col("_gf_cid"))
        .agg(sum(term.cast(DecimalType(38, 10))).as("_gf_dd"))
        .groupBy("_gf_id")
        .agg(min(struct(col("_gf_dd"), col("_gf_cid"))).as("_gf_best"))
        .select(col("_gf_id"), col("_gf_best").getField("_gf_cid").as("_gf_cid"),
          col("_gf_best").getField("_gf_dd").as("_gf_dd"))
    }

    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = assign(centroids)
      val means = pts.join(assigned.select("_gf_id", "_gf_cid"), Seq("_gf_id"))
        .groupBy(col("_gf_cid"), col("_gf_pos"))
        .agg(graft.Num.dround(
          sum(col("_gf_x").cast(DecimalType(38, 6))).cast(DoubleType) /
            count(lit(1)), 6).as("_gf_m"))
      // empty clusters keep their previous centroid
      centroids = centroids.join(means, Seq("_gf_cid", "_gf_pos"), "left")
        .select(col("_gf_cid"), col("_gf_pos"),
          coalesce(col("_gf_m"), col("_gf_c")).as("_gf_c"))
    }
    (centroids, assigned)
  }

  /** Run `iters` Lloyd rounds from `init` over `vecCol: array<float>`.
    * Returns the melted final state: (cluster, pos, centroid, n) — n the
    * cluster's final population (repeated per pos; 0 for never-won
    * clusters, whose centroids pass through from init). */
  def lloydWalk(df: DataFrame, idCol: String, vecCol: String,
                init: Seq[Seq[Double]], iters: Int): DataFrame = {
    val (centroids, assigned) = walk(df, idCol, vecCol, init, iters)
    val sizes = assigned.groupBy("_gf_cid").agg(count(lit(1)).as("n"))
    centroids.join(sizes, Seq("_gf_cid"), "left")
      .select(col("_gf_cid").as("cluster"), col("_gf_pos").as("pos"),
        col("_gf_c").as("centroid"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** The walk's FINAL per-vector assignment — (id, cluster, dist), dist
    * the exact-decimal squared distance 6dp-dround'd: the cell map an
    * IVF built from this walk would store, every row oracle-replayable. */
  def lloydAssignments(df: DataFrame, idCol: String, vecCol: String,
                       init: Seq[Seq[Double]], iters: Int): DataFrame = {
    val (_, assigned) = walk(df, idCol, vecCol, init, iters)
    assigned.select(col("_gf_id").as(idCol), col("_gf_cid").as("cluster"),
      graft.Num.dround(col("_gf_dd").cast(DoubleType), 6).as("dist"))
  }

  /** `nprobe` nearest cells per query against a [[lloydWalk]] centroid
    * frame — the SAME exact distance chain as training (6dp coords,
    * 10dp-dround'd terms, exact-decimal sums, (d, cluster) tie order).
    * Output: (idCol, cluster, probe_rank). */
  def probeCells(queries: DataFrame, idCol: String, vecCol: String,
                 walkCentroids: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val qpts = queries
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("_gf_qid"),
        posexplode(col(vecCol)).as(Seq("_gf_pos", "_gf_xf")))
      .select(col("_gf_qid"), col("_gf_pos"),
        graft.Num.dround(col("_gf_xf").cast(DoubleType), 6).as("_gf_x"))
    val cents = walkCentroids.select(col("cluster").as("_gf_cid"),
      col("pos").as("_gf_pos"), col("centroid").as("_gf_c"))
    val term = graft.Num.dround(
      (col("_gf_x") - col("_gf_c")) * (col("_gf_x") - col("_gf_c")), 10)
    val d = qpts.join(broadcast(cents), Seq("_gf_pos"))
      .groupBy(col("_gf_qid"), col("_gf_cid"))
      .agg(sum(term.cast(DecimalType(38, 10))).as("_gf_dd"))
    val w = Window.partitionBy(col("_gf_qid"))
      .orderBy(col("_gf_dd"), col("_gf_cid"))
    d.withColumn("_gf_rk", row_number().over(w))
      .where(col("_gf_rk") <= nprobe)
      .select(col("_gf_qid").as(idCol), col("_gf_cid").as("cluster"),
        col("_gf_rk").as("probe_rank"))
  }

  // ---- DuckDB mirror -------------------------------------------------

  /** SQL literal VALUES relation `(cid, pos, c)` for an init set. */
  def sqlInit(init: Seq[Seq[Double]]): String =
    init.zipWithIndex.flatMap { case (v, cid) =>
      v.zipWithIndex.map { case (x, pos) => s"($cid, $pos, CAST($x AS DOUBLE))" }
    }.mkString("(VALUES ", ", ", ")")

  /** Final SELECT for [[lloydAssignments]] — expects [[sqlLloydWalk]]'s
    * chain to precede it (reads the last round's distance CTE). */
  def sqlLloydAssignSelect(iters: Int): String =
    s"""SELECT vid AS vec_id, cid AS cluster,
          floor(CAST(d AS DOUBLE) * 1e6 + 0.5) / 1e6 AS dist
        FROM (SELECT vid, cid, d,
                row_number() OVER (PARTITION BY vid ORDER BY d, cid) AS rn
              FROM kmd$iters) t WHERE rn = 1"""

  /** Unrolled CTE chain replaying the whole walk over
    * `rel(vec_id, embedding)`: ends in `kmfinal(cluster, pos, centroid,
    * n)` — one assign/update pair per iteration, each round reading the
    * previous round's centroid CTE. */
  def sqlLloydWalk(rel: String, init: Seq[Seq[Double]], iters: Int): String = {
    val rounds = (1 to iters).map { r =>
      val prev = if (r == 1) "kmc0" else s"kmc${r - 1}"
      s"""kmd$r AS (
           SELECT p.vid, c.cid,
                  sum(CAST(floor((p.x - c.c) * (p.x - c.c) * 1e10 + 0.5) / 1e10
                       AS DECIMAL(38,10))) AS d
           FROM kmpts p JOIN $prev c ON p.pos = c.pos
           GROUP BY 1, 2),
         kma$r AS (
           SELECT vid, cid FROM (
             SELECT vid, cid,
                    row_number() OVER (PARTITION BY vid ORDER BY d, cid) AS rn
             FROM kmd$r) WHERE rn = 1),
         kmm$r AS (
           SELECT a.cid, p.pos,
                  floor((CAST(sum(CAST(p.x AS DECIMAL(38,6))) AS DOUBLE)
                    / count(*)) * 1e6 + 0.5) / 1e6 AS m
           FROM kmpts p JOIN kma$r a ON p.vid = a.vid
           GROUP BY 1, 2),
         kmc$r AS (
           SELECT c.cid, c.pos, coalesce(m.m, c.c) AS c
           FROM $prev c LEFT JOIN kmm$r m
             ON m.cid = c.cid AND m.pos = c.pos)"""
    }.mkString(",\n        ")
    s"""kmpts AS (
          SELECT vec_id AS vid, CAST(pos AS INT) AS pos,
                 floor(CAST(xf AS DOUBLE) * 1e6 + 0.5) / 1e6 AS x
          FROM (SELECT vec_id, unnest(embedding) AS xf,
                       unnest(range(len(embedding))) AS pos
                FROM $rel WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)),
        kmc0 AS (SELECT * FROM ${sqlInit(init)} AS t(cid, pos, c)),
        $rounds,
        kmsz AS (SELECT cid, CAST(count(*) AS BIGINT) AS n
                 FROM kma$iters GROUP BY 1),
        kmfinal AS (
          SELECT c.cid AS cluster, c.pos, c.c AS centroid,
                 coalesce(s.n, 0) AS n
          FROM kmc$iters c LEFT JOIN kmsz s ON s.cid = c.cid)"""
  }
}
