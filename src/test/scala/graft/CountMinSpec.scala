package graft

import graft.ops.CountMin
import org.apache.spark.sql.functions._

/** Pins for the Count-Min sketch ([[graft.ops.CountMin]]): the cell's
  * closed form, never-undercount + exactness without collisions, the
  * cell-wise merge law, weighted occurrences, a hand-planted collision
  * exercising min-over-rows, and the refusal ladder. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def cellOf(key: Long, j: Int, w: Int): Long = {
    val p = CountMin.RowPrimes(j)
    key * 2654435761L % p * (2654435761L + 2L * j) % p % w
  }

  test("cell matches its closed form") {
    val got = (0L to 20L).toDF("k")
      .select(col("k"), CountMin.cell(col("k"), 2, 64).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- 0L to 20L) assert(got(k) == cellOf(k, 2, 64))
  }

  test("estimates never undercount, and are exact when cells are collision-free") {
    // keys 0..9, depth 3, width 4096: verify collision-freedom by
    // construction before asserting exactness
    val keys = (0L to 9L)
    for (j <- 0 until 3)
      assert(keys.map(cellOf(_, j, 4096)).distinct.size == keys.size,
        s"fixture unexpectedly collides in row $j — pick a wider sketch")
    val df = keys.flatMap(k => Seq.fill((k + 1).toInt)(k)).toDF("k")
    val sk = CountMin.sketch(df, "k", depth = 3, width = 4096)
    val est = CountMin.estimate(sk, keys.toDF("k"), "k", 3, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- keys) assert(est(k) == k + 1)
    // a key never inserted estimates 0 only if all its cells are empty;
    // at this width that's the case for key 1000
    val miss = CountMin.estimate(sk, Seq(1000L).toDF("k"), "k", 3, 4096)
      .collect()(0).getLong(1)
    assert(miss >= 0L)
    // tight width forces collisions: estimates still never undercount
    val skTight = CountMin.sketch(df, "k", depth = 2, width = 3)
    val estT = CountMin.estimate(skTight, keys.toDF("k"), "k", 2, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- keys) assert(estT(k) >= k + 1)
  }

  test("merge is cell-wise addition: sketch(A union B) == merge(sketch(A), sketch(B))") {
    val a = Seq(1L, 2L, 2L, 3L).toDF("k")
    val b = Seq(2L, 3L, 3L, 9L).toDF("k")
    val whole = CountMin.sketch(a.unionByName(b), "k", 4, 32)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = CountMin.merge(
        CountMin.sketch(a, "k", 4, 32), CountMin.sketch(b, "k", 4, 32))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(whole == merged)
  }

  test("weighted occurrences count their weight") {
    val df = Seq((5L, 10L), (5L, 3L), (7L, 2L)).toDF("k", "w")
    val sk = CountMin.sketch(df, "k", 2, 4096, weight = col("w"))
    val est = CountMin.estimate(sk, Seq(5L, 7L).toDF("k"), "k", 2, 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est(5L) == 13L && est(7L) == 2L)
  }

  test("a planted single-row collision is absorbed by min-over-rows") {
    // find two keys that collide in row 0 but nowhere else (w=8, d=3)
    val pair = (for {
      x <- 1L to 200L; y <- (x + 1) to 200L
      if cellOf(x, 0, 8) == cellOf(y, 0, 8) &&
        cellOf(x, 1, 8) != cellOf(y, 1, 8) &&
        cellOf(x, 2, 8) != cellOf(y, 2, 8)
    } yield (x, y)).headOption
    assert(pair.nonEmpty, "no single-row-colliding pair below 200 at w=8")
    val (x, y) = pair.get
    // plant: x appears once, y appears 50 times, nothing else
    val df = (Seq(x) ++ Seq.fill(50)(y)).toDF("k")
    val sk = CountMin.sketch(df, "k", 3, 8)
    val est = CountMin.estimate(sk, Seq(x).toDF("k"), "k", 3, 8)
      .collect()(0).getLong(1)
    // row 0's counter holds 51 (the collision), rows 1-2 hold 1 unless y
    // also collides there (excluded by construction) — min rescues x
    assert(est == 1L, s"min-over-rows failed: est=$est for the planted key")
  }

  test("refusal ladder: shape, key range, sql fragments") {
    val df = Seq(1L).toDF("k")
    intercept[IllegalArgumentException] { CountMin.sketch(df, "k", 0, 8) }
    intercept[IllegalArgumentException] { CountMin.sketch(df, "k", 9, 8) }
    intercept[IllegalArgumentException] { CountMin.sketch(df, "k", 2, 0) }
    intercept[IllegalArgumentException] { CountMin.sqlCell("k", 8, 8) }
    // out-of-range key raises at execution (a wrapped product would land
    // in a silently different cell than the oracle computes)
    val bad = Seq(Long.MaxValue / 2).toDF("k")
    val ex = intercept[Exception] {
      CountMin.sketch(bad, "k", 2, 8).collect()
    }
    assert(ex.getMessage.contains("out of range"))
  }

  test("joinSizeEstimate: exact inner product at wide width, never undercounts") {
    import spark.implicits._
    // A has key 1 x3, key 2 x2; B has key 1 x2, key 3 x5 →
    // true join size = 3*2 = 6; at w = 2^20 collisions are absent, so
    // every row's inner product is exactly 6
    val a = Seq(1L, 1L, 1L, 2L, 2L).toDF("k")
    val b = Seq(1L, 1L, 3L, 3L, 3L, 3L, 3L).toDF("k")
    val d = 3; val w = 1 << 20
    val est = graft.ops.CountMin.joinSizeEstimate(
      graft.ops.CountMin.sketch(a, "k", d, w),
      graft.ops.CountMin.sketch(b, "k", d, w), d)
      .collect()(0).getLong(0)
    assert(est == 6L)
    // disjoint keys: some row has zero shared cells -> estimate 0
    val c = Seq(9L, 10L).toDF("k")
    val est0 = graft.ops.CountMin.joinSizeEstimate(
      graft.ops.CountMin.sketch(a, "k", d, w),
      graft.ops.CountMin.sketch(c, "k", d, w), d)
      .collect()(0).getLong(0)
    assert(est0 == 0L)
  }
}
