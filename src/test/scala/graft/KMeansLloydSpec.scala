package graft

import graft.sim.KMeansLloyd

class KMeansLloydSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("hand-computed 1-D Lloyd rounds: assignment, means, convergence") {
    // points {0, 1, 9, 10}; explicit init {0.125, -0.125}. Round 1:
    // every non-negative point is nearer 0.125 → cluster 0 takes all,
    // cluster 1 empties and keeps -0.125; c0 = mean = 5.0.
    // Round 2: {0,1} are nearer -0.125 (|0−5| = 5 vs 0.125) → cluster 1;
    // {9,10} stay cluster 0 → c0 = 9.5, c1 = 0.5.
    val df = vecs(1L -> Seq(0f), 2L -> Seq(1f), 3L -> Seq(9f), 4L -> Seq(10f))
    val out = KMeansLloyd.lloydWalk(df, "vec_id", "embedding",
        Seq(Seq(0.125), Seq(-0.125)), iters = 2)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((0, 9.5, 2L), (1, 0.5, 2L)))
  }

  test("a cluster that never wins keeps its init centroid with n = 0") {
    val df = vecs(1L -> Seq(0.125f), 2L -> Seq(0.125f))
    val out = KMeansLloyd.lloydWalk(df, "vec_id", "embedding",
        Seq(Seq(0.125), Seq(-0.125)), iters = 1)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getLong(3)))
    // both points sit exactly on centroid 0 → cluster 1 stays at its
    // init value −0.125 with population 0
    assert(out.toSeq == Seq((0, 0.125, 2L), (1, -0.125, 0L)))
  }

  test("argmin ties break on the lowest cluster id") {
    // a point equidistant from both centroids must land in cluster 0
    val df = vecs(1L -> Seq(0f))
    val out = KMeansLloyd.lloydWalk(df, "vec_id", "embedding",
        Seq(Seq(0.125), Seq(-0.125)), iters = 1)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getLong(3)))
    assert(out.toSeq == Seq((0, 1L), (1, 0L)))
  }

  test("walshInit shapes and refusals") {
    val w = KMeansLloyd.walshInit(4, 64)
    assert(w.size == 4 && w.forall(_.size == 64))
    assert(w.flatten.forall(x => x == 0.125 || x == -0.125))
    // orthogonality of the sign patterns
    for (a <- w; b <- w if a != b)
      assert(a.zip(b).map { case (x, y) => x * y }.sum == 0.0)
    val df = vecs(1L -> Seq(0f))
    intercept[IllegalArgumentException] {
      KMeansLloyd.lloydWalk(df, "vec_id", "embedding", Seq.empty, 1)
    }
    intercept[IllegalArgumentException] {
      KMeansLloyd.lloydWalk(df, "vec_id", "embedding",
        Seq(Seq(0.1), Seq(0.1, 0.2)), 1)
    }
    intercept[IllegalArgumentException] {
      KMeansLloyd.lloydWalk(df, "vec_id", "embedding",
        Seq(Seq(0.125), Seq(-0.125)), 0)
    }
  }

  test("probeCells ranks cells by the walk's exact distance; self-query tops its own search") {
    val df = vecs(1L -> Seq(0f), 2L -> Seq(1f), 3L -> Seq(9f), 4L -> Seq(10f))
    val init = Seq(Seq(0.125), Seq(-0.125))
    val cents = KMeansLloyd.lloydWalk(df, "vec_id", "embedding", init, 2)
    // after round 2: c0 = 9.5, c1 = 0.5 — a query at 8.0 probes c0 first
    val p = KMeansLloyd.probeCells(vecs(9L -> Seq(8f)), "vec_id", "embedding",
        cents, nprobe = 2)
      .orderBy("probe_rank").collect()
      .map(r => (r.getInt(1), r.getInt(2)))
    assert(p.toSeq == Seq((0, 1), (1, 2)))
    intercept[IllegalArgumentException] {
      KMeansLloyd.probeCells(df, "vec_id", "embedding", cents, 0)
    }
  }
}
