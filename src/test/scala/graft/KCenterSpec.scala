package graft

import org.apache.spark.sql.functions._

import graft.sim.KCenter

/** Pins for greedy k-center diversity sampling (SURVEY §2 row 139):
  * exact trajectory equivalence with a driver-side brute force, the
  * geometric hand fixture, null/empty-vector skip, duplicate points,
  * and the exhaustion refusal. */
class KCenterSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the same greedy rule in plain Scala. */
  private def brute(vs: Seq[(Long, Array[Double])], k: Int): Seq[Long] = {
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
    val centers = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    while (picked.size < k) {
      val cands = vs.filterNot(v => picked.contains(v._1))
      val scored = cands.map { case (id, v) =>
        val d = if (centers.isEmpty) v.map(x => x * x).sum
                else centers.map(c => d2(v, c)).min
        (d, id)
      }
      val best = scored.maxBy { case (d, id) => (d, -id) }
      picked += best._2
      centers += cands.find(_._1 == best._2).get._2
    }
    picked.toSeq
  }

  test("geometric fixture: corners of a square picked before the middle") {
    // farthest-from-origin seed is (10,10); next the opposite corner;
    // the near-center point is never reached at k=3
    val pts = Seq(
      (1L, Array(0f, 0f)), (2L, Array(10f, 10f)),
      (3L, Array(10f, 0f)), (4L, Array(0f, 10f)), (5L, Array(5f, 5.5f)))
    val out = KCenter.select(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 3).orderBy("round")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(out.map(_._2) == Seq(2L, 1L, 3L) || out.map(_._2) == Seq(2L, 1L, 4L))
    // ties (3 and 4 are equidistant from {2,1}) break on min id
    assert(out.map(_._2) == Seq(2L, 1L, 3L))
  }

  test("trajectory matches the brute-force greedy rule on the corpus") {
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 120)
    val out = KCenter.select(e, "vec_id", "embedding", k = 6)
      .orderBy("round").collect().map(_.getLong(1)).toSeq
    val vs = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    assert(out == brute(vs, 6))
  }

  test("null and empty vectors are skipped; duplicates never re-pick") {
    val pts = Seq(
      (1L, Some(Array(1f, 1f))), (2L, Some(Array(1f, 1f))),
      (3L, None), (4L, Some(Array.empty[Float])), (5L, Some(Array(2f, 0f))))
      .toDF("vec_id", "embedding")
    val out = KCenter.select(pts, "vec_id", "embedding", k = 3)
      .orderBy("round").collect().map(_.getLong(1)).toSeq
    // seed = max norm (id 5, norm 4 > 2); then one of the (1,1) twins
    // (min id 1), then the remaining twin at distance 0 — never 3 or 4
    assert(out == Seq(5L, 1L, 2L))
  }

  test("mmr: trajectory matches brute force; lambda=1 degenerates to cosine top-k") {
    val e = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)
    val q = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val vs = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    def bruteMmr(lam: Double, k: Int): Seq[Long] = {
      val qv = q.toArray
      val picked = scala.collection.mutable.ArrayBuffer.empty[Long]
      val sel = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      while (picked.size < k) {
        val cands = vs.filterNot(v => picked.contains(v._1))
        val best = cands.map { case (id, v) =>
          val score = if (sel.isEmpty) cos(v, qv)
            else lam * cos(v, qv) - (1.0 - lam) * sel.map(s => cos(v, s)).max
          (score, id)
        }.maxBy { case (sc, id) => (sc, -id) }
        picked += best._2
        sel += cands.find(_._1 == best._2).get._2
      }
      picked.toSeq
    }
    val got = graft.sim.Mmr.select(e, "vec_id", "embedding", q, k = 5, lambda = 0.7)
      .orderBy("round").collect().map(_.getLong(1)).toSeq
    assert(got == bruteMmr(0.7, 5))
    // lambda = 1: pure relevance — equals cosine top-k order (min-id ties)
    val rel = graft.sim.Mmr.select(e, "vec_id", "embedding", q, k = 5, lambda = 1.0)
      .orderBy("round").collect().map(_.getLong(1)).toSeq
    val topk = vs.map { case (id, v) => (cos(v, q.toArray), id) }
      .sortBy { case (sc, id) => (-sc, id) }.take(5).map(_._2)
    assert(rel == topk)
    // misuse refusals
    assertThrows[IllegalArgumentException](
      graft.sim.Mmr.select(e, "vec_id", "embedding", q, k = 0, lambda = 0.5))
    assertThrows[IllegalArgumentException](
      graft.sim.Mmr.select(e, "vec_id", "embedding", q, k = 1, lambda = 1.5))
    assertThrows[IllegalArgumentException](
      graft.sim.Mmr.select(e.limit(2), "vec_id", "embedding", q, k = 5, lambda = 0.5))
  }

  test("exhaustion refuses loudly instead of padding") {
    val pts = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      KCenter.select(pts, "vec_id", "embedding", k = 3)
    }
    assert(ex.getMessage.contains("exhausted"))
  }
}
