package graft

import graft.sim.Hybrid

/** Pins for RRF fusion ([[graft.sim.Hybrid]]): the closed-form score,
  * the absent-list convention, and the input validation. */
class HybridSpec extends SparkSpec {
  import spark.implicits._

  test("fusion scores are the closed-form reciprocal sums") {
    // query 1: doc 10 is rank 1 lexically and rank 2 semantically;
    // doc 20 only lexical rank 2; doc 30 only semantic rank 1.
    val bm = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("q", "id", "rank")
    val ann = Seq((1L, 30L, 1), (1L, 10L, 2)).toDF("q", "id", "rank")
    val out = Hybrid.rrf(Seq(bm, ann), "q", "id", "rank", k = 10)
      .orderBy("rank").collect()
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // doc 10: 1/61 + 1/62 — present in both, must fuse to the top
    assert(out(0).getLong(2) == 10L
      && out(0).getDouble(3) == r6(1.0 / 61 + 1.0 / 62))
    // single-list docs contribute 0 from the missing list; the rank-1
    // semantic doc (1/61) beats the rank-2 lexical doc (1/62)
    assert(out(1).getLong(2) == 30L && out(1).getDouble(3) == r6(1.0 / 61))
    assert(out(2).getLong(2) == 20L && out(2).getDouble(3) == r6(1.0 / 62))
  }

  test("k truncates per query and ties break on the id") {
    val bm = Seq((1L, 10L, 1), (1L, 20L, 1)).toDF("q", "id", "rank")
    val out = Hybrid.rrf(Seq(bm), "q", "id", "rank", k = 1).collect()
    assert(out.length == 1 && out(0).getLong(2) == 10L) // equal score, lower id
    intercept[IllegalArgumentException] {
      Hybrid.rrf(Seq.empty, "q", "id", "rank")
    }
    intercept[IllegalArgumentException] {
      Hybrid.rrf(Seq(bm), "q", "id", "rank", k = 0)
    }
  }
}
