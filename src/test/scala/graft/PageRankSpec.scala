package graft

import graft.graph.PageRank

/** Pins for fixed-iteration PageRank (SURVEY §2 row 151): a hand-computed
  * 3-node fixture (rank flow, dangling leak, zero-in-degree base case),
  * the ring invariant (symmetric graph stays at the uniform fixpoint),
  * multi-edge collapse, and the refusal ladder. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed fixture: 1⇄2 plus dangling 3") {
    // Edges: 1→2, 1→3, 2→1. Node 3 dangles (mass leaks, never emits).
    // r0 = 1 everywhere.
    // i1: 1 sends 0.5 to {2,3}; 2 sends 1.0 to 1.
    //   r1 = (1: .15+.85·1 = 1.0), (2: .575), (3: .575)
    // i2: 1 sends .5; 2 sends .575.
    //   r2 = (1: .15+.85·.575 = .63875), (2: .575), (3: .575)
    // i3: 1 sends .319375; 2 sends .575.
    //   r3 = (1: .63875), (2: .42146875), (3: .42146875)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    val out = PageRank.ranks(edges, "src", "dst", iterations = 3)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 0.63875), (2L, 0.42146875), (3L, 0.42146875)))
  }

  test("a symmetric ring is already the fixpoint: ranks stay 1.0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = PageRank.ranks(edges, "src", "dst", iterations = 4)
      .collect().map(_.getDouble(1)).toSet
    assert(out == Set(1.0))
  }

  test("zero-in-degree nodes settle at base; multi-edges collapse") {
    // 5→6 twice (one distinct edge) and 5→7: node 5 receives nothing.
    val edges = Seq((5L, 6L), (5L, 6L), (5L, 7L)).toDF("src", "dst")
    val out = PageRank.ranks(edges, "src", "dst", iterations = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // i1: 5 sends 1/2 to each of 6,7 → r1(5)=.15, r1(6)=r1(7)=.575.
    // i2: 5 sends .15/2=.075 → r2(6)=r2(7)=.15+.85·.075=.21375.
    assert(out == Seq((5L, 0.15), (6L, 0.21375), (7L, 0.21375)))
  }

  test("personalized walk: seeds hold the teleport, non-seeds earn rank") {
    // Chain 1→2→3, seed {1}, 2 iterations:
    //   r0 = (1, 0, 0)
    //   r1 = (0.15, 0.85·1, 0)        = (0.15, 0.85, 0)
    //   r2 = (0.15, 0.85·0.15, 0.85·0.85) = (0.15, 0.1275, 0.7225)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = graft.graph.PageRank.personalizedRanks(
        edges, "src", "dst", seeds, "node", iterations = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 0.15), (2L, 0.1275), (3L, 0.7225)))
  }

  test("all-node seeds reduce personalized to the uniform walk") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    val all = Seq(1L, 2L, 3L).toDF("node")
    val uniform = graft.graph.PageRank.ranks(edges, "src", "dst", iterations = 3)
      .orderBy("node").collect().map(_.toString).toSeq
    val ppr = graft.graph.PageRank.personalizedRanks(
        edges, "src", "dst", all, "node", iterations = 3)
      .orderBy("node").collect().map(_.toString).toSeq
    assert(uniform == ppr)
  }

  test("null endpoints drop; refusal ladder") {
    val edges = Seq((Option(1L), Option(2L)), (Option.empty[Long], Option(3L)),
      (Option(2L), Option.empty[Long])).toDF("src", "dst")
    val out = PageRank.ranks(edges, "src", "dst", iterations = 1)
      .orderBy("node").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L))

    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](PageRank.ranks(e, "src", "dst", iterations = 0))
    intercept[IllegalArgumentException](PageRank.ranks(e, "src", "dst", damping = 1.0))
    intercept[IllegalArgumentException](PageRank.ranks(e, "src", "dst", base = 0.0))
    intercept[IllegalArgumentException](PageRank.ranks(e, "src", "dst", scale = 12))
  }
}
