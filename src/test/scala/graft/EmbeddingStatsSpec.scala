package graft

import graft.sim.EmbeddingStats

/** Pins for the embedding outlier audit
  * ([[graft.sim.EmbeddingStats.centroidDistances]]/`pruneFar`):
  * hand-computed distances, the far-vector ordering, inclusive
  * threshold, and broadcast-join shape. */
class EmbeddingStatsSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String, Seq[Float])*) =
    rows.toDF("vec_id", "label", "embedding")

  test("hand-computed distance to the group centroid") {
    // centroid of {[1,0],[0,1]} = [0.5,0.5]; each vector is 0.5 away².
    val d = EmbeddingStats.centroidDistances(
        df((1L, "a", Seq(1f, 0f)), (2L, "a", Seq(0f, 1f))),
        "vec_id", "label", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("n_dims"), r.getAs[Double]("dist_sq"))).toMap
    assert(d(1L) == ((2L, 0.5)) && d(2L) == ((2L, 0.5)))
  }

  test("a mislabeled vector is the farthest from its prototype") {
    // b = {[1,0],[1,0],[-1,0]}: centroid [1/3,0]; the flipped vector is
    // (4/3)² = 1.777⁷ away, the aligned ones (2/3)² = 0.444⁴.
    val d = EmbeddingStats.centroidDistances(
        df((1L, "b", Seq(1f, 0f)), (2L, "b", Seq(1f, 0f)),
          (3L, "b", Seq(-1f, 0f))),
        "vec_id", "label", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("dist_sq"))
      .toMap
    assert(d(3L) > d(1L) && d(1L) == d(2L))
    assert(math.abs(d(3L) - 16.0 / 9) < 1e-4)
    // single-vector groups sit exactly on their centroid
    val solo = EmbeddingStats.centroidDistances(
      df((9L, "c", Seq(0.3f, -0.7f))), "vec_id", "label", "embedding")
      .collect().head
    assert(solo.getAs[Double]("dist_sq") == 0.0)
  }

  test("pruneFar keeps within-budget vectors, threshold inclusive") {
    val data = df((1L, "a", Seq(1f, 0f)), (2L, "a", Seq(0f, 1f)),
      (3L, "b", Seq(1f, 0f)), (4L, "b", Seq(1f, 0f)), (5L, "b", Seq(-1f, 0f)))
    def kept(t: Double) = EmbeddingStats.pruneFar(
        data, "vec_id", "label", "embedding", maxDistSq = t)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(kept(0.5) == Set(1L, 2L, 3L, 4L))   // 0.5 inclusive; 0.4444 in
    assert(kept(0.45) == Set(3L, 4L))          // group a (0.5) now out
    assert(kept(0.4) == Set.empty[Long])       // 0.4444 out too
    intercept[IllegalArgumentException] {
      EmbeddingStats.pruneFar(data, "vec_id", "label", "embedding", -1.0) }
  }

  test("the centroid side of the distance join is broadcast") {
    val plan = EmbeddingStats.centroidDistances(
        df((1L, "a", Seq(1f, 0f)), (2L, "a", Seq(0f, 1f))),
        "vec_id", "label", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
