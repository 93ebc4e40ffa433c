package graft

import org.apache.spark.sql.functions._

import graft.ops.Hll

/** Pins for the portable HyperLogLog (SURVEY §2 row 154): the integer
  * bit-length ladder at its boundaries, the register merge law, estimate
  * accuracy within the m=256 theoretical error on a known cardinality,
  * the linear-counting small-range branch, and the refusal ladder. */
class HllSpec extends SparkSpec {
  import spark.implicits._

  test("bitlen ladder: exact boundaries") {
    val cases = Seq(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3, 7L -> 3,
      8L -> 4, (1L << 23) -> 24, (1L << 24) - 1 -> 24)
    val out = cases.map(_._1).toDF("w")
      .select(Hll.bitlen(col("w"), 24).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(out == cases.map(_._2))
  }

  test("registers merge by max: reg(A ∪ B) = max-merge(reg(A), reg(B))") {
    val a = (1L to 4000L).map(i => ("g", s"key_a_$i")).toDF("grp", "k")
    val b = (1L to 4000L).map(i => ("g", s"key_b_$i")).toDF("grp", "k")
    val union = Hll.registers(a.unionByName(b), "k", Seq("grp"))
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    val merged = Hll.registers(a, "k", Seq("grp"))
      .unionByName(Hll.registers(b, "k", Seq("grp")))
      .groupBy("grp", "bucket").agg(max("max_rho").as("max_rho"))
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(union == merged)
  }

  test("estimate within the m=256 error band on a known cardinality") {
    val n = 50000
    val df = (1L to n.toLong).map(i => ("g", s"document_$i")).toDF("grp", "k")
    val est = Hll.estimate(df, "k", Seq("grp"))
      .collect().head.getDouble(3)
    // 1.04/sqrt(256) = 6.5% standard error; 3 sigma ≈ 20%.
    assert(math.abs(est - n) / n < 0.2, s"estimate $est too far from $n")
  }

  test("small cardinalities take the linear-counting branch and stay tight") {
    val df = (1L to 10L).map(i => ("g", s"v$i")).toDF("grp", "k")
    val row = Hll.estimate(df, "k", Seq("grp")).collect().head
    val (nz, est) = (row.getLong(1), row.getDouble(3))
    assert(nz <= 10)
    assert(math.abs(est - 10.0) < 3.0, s"linear counting drifted: $est")
  }

  test("overlap: planted 50% intersection estimated by inclusion-exclusion") {
    // A = 1..4000, B = 2001..6000 → |A∩B| = 2000, |A∪B| = 6000.
    val a = (1L to 4000L).map(i => ("a", s"key_$i"))
    val b = (2001L to 6000L).map(i => ("b", s"key_$i"))
    val c = (1L to 3000L).map(i => ("c", s"other_$i")) // disjoint from both
    val df = (a ++ b ++ c).toDF("src", "k")
    val rows = Hll.overlap(df, "k", "src")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val (unionAb, interAb, jacAb) = rows(("a", "b"))
    assert(math.abs(unionAb - 6000) / 6000 < 0.2, s"union $unionAb")
    assert(math.abs(interAb - 2000) / 2000 < 0.5, s"intersect $interAb")
    assert(jacAb > 0.15 && jacAb < 0.55, s"jaccard $jacAb")
    // disjoint pairs: intersection estimate is noise around 0 — the
    // clamped jaccard must be far below the planted pair's
    val (_, _, jacAc) = rows(("a", "c"))
    assert(jacAc < jacAb / 2, s"disjoint jaccard $jacAc vs planted $jacAb")
  }

  test("duplicates do not move the sketch; refusals") {
    val once = (1L to 100L).map(i => ("g", s"v$i")).toDF("grp", "k")
    val thrice = once.unionByName(once).unionByName(once)
    assert(Hll.estimate(once, "k", Seq("grp")).collect().head ==
      Hll.estimate(thrice, "k", Seq("grp")).collect().head)
    intercept[IllegalArgumentException](Hll.registers(once, "k", Seq("grp"), p = 6))
    intercept[IllegalArgumentException](Hll.registers(once, "k", Seq("grp"), p = 13))
  }

  test("64-bit lane: registers in range, merge law holds, estimate in band") {
    val n = 50000
    val df = (1L to n.toLong).map(i => ("g", s"document_$i")).toDF("grp", "k")
    val regs = Hll.registers64(df, "k", Seq("grp")).collect()
    // bucket = top 8 bits of a 64-bit hash via the HIGH half: [0, 256)
    assert(regs.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
    // ρ ∈ [1, 57] — the 56-bit word's ladder range
    assert(regs.forall(r => r.getInt(2) >= 1 && r.getInt(2) <= 57))
    val est = Hll.estimate64(df, "k", Seq("grp")).collect().head.getDouble(3)
    assert(math.abs(est - n) / n < 0.20, s"64-bit estimate $est vs $n")
    // merge law: reg64(A ∪ B) = max-merge(reg64(A), reg64(B))
    val a = (1L to 3000L).map(i => ("g", s"ka$i")).toDF("grp", "k")
    val b = (1L to 3000L).map(i => ("g", s"kb$i")).toDF("grp", "k")
    val union = Hll.registers64(a.unionByName(b), "k", Seq("grp"))
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    val merged = Hll.registers64(a, "k", Seq("grp"))
      .unionByName(Hll.registers64(b, "k", Seq("grp")))
      .groupBy("grp", "bucket").agg(max("max_rho").as("max_rho"))
      .orderBy("bucket").collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(union == merged)
    // duplicate invariance carries over; p=7 is below the 64-bit floor
    val once = (1L to 100L).map(i => ("g", s"v$i")).toDF("grp", "k")
    val thrice = once.unionByName(once).unionByName(once)
    assert(Hll.estimate64(once, "k", Seq("grp")).collect().head ==
      Hll.estimate64(thrice, "k", Seq("grp")).collect().head)
    intercept[IllegalArgumentException](Hll.registers64(once, "k", Seq("grp"), p = 7))
  }
}
