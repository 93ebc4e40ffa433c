package graft

import org.apache.spark.sql.functions._

import graft.quality.AbTest

/** Pins for the two-proportion readout (SURVEY §2 row 165): hand-computed
  * rates/z/Wilson on a small fixture, the Wald-collapse case Wilson
  * exists to fix, one-armed-group nulls, refusals. */
class AbTestSpec extends SparkSpec {
  import spark.implicits._

  private def wilson(p: Double, n: Double, z: Double, lower: Boolean): Double = {
    val z2 = z * z
    val c = p + z2 / (2.0 * n)
    val m = z * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)
    val d = math.floor((if (lower) (c - m) else (c + m)) / (1.0 + z2 / n) * 1e6 + 0.5) / 1e6
    d
  }

  test("hand-computed rates, pooled z and Wilson bounds") {
    // arm a: 10 rows, 4 successes; arm b: 10 rows, 7 successes.
    val rows = (1 to 10).map(i => ("g", "a", i <= 4)) ++
      (1 to 10).map(i => ("g", "b", i <= 7))
    val r = AbTest.proportions(rows.toDF("grp", "arm", "flag"),
      "arm", "flag", Seq("grp")).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10L, 4L, 10L, 7L)))
    assert(r.getAs[Double]("p_a") == 0.4 && r.getAs[Double]("p_b") == 0.7)
    val pp = 11.0 / 20.0
    val se = math.sqrt(pp * (1 - pp) * (1.0 / 10 + 1.0 / 10))
    val zExp = math.floor((0.7 - 0.4) / se * 1e4 + 0.5) / 1e4
    assert(r.getAs[Double]("z_stat") == zExp)
    assert(r.getAs[Double]("a_lo") == wilson(0.4, 10, 1.96, lower = true))
    assert(r.getAs[Double]("b_hi") == wilson(0.7, 10, 1.96, lower = false))
  }

  test("p = 0 and p = 1: Wilson stays strictly inside (0,1), Wald would collapse") {
    val rows = (1 to 20).map(i => ("g", "a", false)) ++
      (1 to 20).map(i => ("g", "b", true))
    val r = AbTest.proportions(rows.toDF("grp", "arm", "flag"),
      "arm", "flag", Seq("grp")).collect().head
    assert(r.getAs[Double]("a_lo") == 0.0 || r.getAs[Double]("a_lo") > -1e-9)
    assert(r.getAs[Double]("a_hi") > 0.0, "p=0 upper bound must be positive")
    assert(r.getAs[Double]("b_lo") < 1.0, "p=1 lower bound must be below 1")
    // z_stat exists: pooled pp = 0.5 → se > 0
    assert(math.abs(r.getAs[Double]("z_stat")) > 3)
  }

  test("one-armed groups emit counts but null statistics") {
    val rows = Seq(("g", "a", true), ("g", "a", false))
    val r = AbTest.proportions(rows.toDF("grp", "arm", "flag"),
      "arm", "flag", Seq("grp")).collect().head
    assert(r.getLong(1) == 2L && r.getLong(3) == 0L)
    assert(!r.isNullAt(5), "arm a rate exists")
    assert(r.isNullAt(6) && r.isNullAt(7) && r.isNullAt(8),
      "no cross-arm statistics without both arms")
  }

  test("refusals and arm hygiene") {
    val df = Seq(("g", "c", true)).toDF("grp", "arm", "flag")
    // unknown arms are excluded; the group then has no arms at all
    assert(AbTest.proportions(df, "arm", "flag", Seq("grp")).collect().isEmpty ||
      AbTest.proportions(df, "arm", "flag", Seq("grp"))
        .collect().head.getLong(1) == 0L)
    intercept[IllegalArgumentException](
      AbTest.proportions(df, "arm", "flag", Seq("grp"), z = 0.0))
  }

  test("cuped: hand-computed theta, adjusted means, and variance reduction") {
    import java.sql.Timestamp
    val cut = 1705276800000000L
    def ts(us: Long) = new Timestamp(us / 1000)
    // users 2/4 (arm a) and 1/3 (arm b), one pre + one post event each:
    //   u=2: x=10 y=20   u=4: x=20 y=30   u=1: x=10 y=22   u=3: x=20 y=32
    // x̄=15 ȳ=26; dx=∓5, dy per user: -6,4,-4,6 → S_xy=5·6+5·4+5·4+5·6=100
    // S_xx=100 → θ=1; y′ = y − 1·(x−15): 25,25,27,27 — arm a mean 25,
    // arm b mean 27 (raw 25/27 too: means are preserved, variance drops)
    // var_y = (36+16+16+36)/4 = 26; y′−ȳ = -1,-1,1,1 → var_adj = 1
    val rows = Seq(
      (2L, cut - 10L, 10.0), (2L, cut + 10L, 20.0),
      (4L, cut - 10L, 20.0), (4L, cut + 10L, 30.0),
      (1L, cut - 10L, 10.0), (1L, cut + 10L, 22.0),
      (3L, cut - 10L, 20.0), (3L, cut + 10L, 32.0),
      // user 5 has no post period → excluded entirely
      (5L, cut - 10L, 99.0))
      .map { case (u, us, v) => (u, ts(us), v) }
      .toDF("user_id", "ts", "value")
    val out = AbTest.cuped(rows, "user_id", "ts", "value", cut)
      .orderBy("arm").collect()
    assert(out.length == 2)
    val a = out(0); val b = out(1)
    assert(a.getAs[String]("arm") == "a" && a.getAs[Long]("n") == 2)
    assert(a.getAs[Long]("n_users") == 4)
    assert(a.getAs[Double]("theta") == 1.0)
    assert(a.getAs[Double]("mean_y") == 25.0 && a.getAs[Double]("mean_y_adj") == 25.0)
    assert(b.getAs[Double]("mean_y") == 27.0 && b.getAs[Double]("mean_y_adj") == 27.0)
    assert(a.getAs[Double]("var_y") == 26.0 && a.getAs[Double]("var_adj") == 1.0)
    assert(math.abs(a.getAs[Double]("var_reduction") - (1.0 - 1.0 / 26.0)) < 1e-6)
  }

  test("cuped: constant covariate refuses adjustment, not the readout") {
    import java.sql.Timestamp
    val cut = 1705276800000000L
    def ts(us: Long) = new Timestamp(us / 1000)
    val rows = Seq(
      (2L, cut - 10L, 7.0), (2L, cut + 10L, 20.0),
      (1L, cut - 10L, 7.0), (1L, cut + 10L, 30.0))
      .map { case (u, us, v) => (u, ts(us), v) }
      .toDF("user_id", "ts", "value")
    val out = AbTest.cuped(rows, "user_id", "ts", "value", cut)
      .orderBy("arm").collect()
    assert(out.forall(_.isNullAt(out.head.fieldIndex("theta"))))
    // unadjusted means pass through
    assert(out.map(r => r.getAs[Double]("mean_y_adj")).toSeq ==
      out.map(r => r.getAs[Double]("mean_y")).toSeq)
  }

  test("mannWhitney: hand-computed midranks, U, and tie-corrected z") {
    // a: {1,2,3}, b: {2,4} → midranks 1, 2.5, 2.5, 4, 5;
    // R_a = 7.5, U_a = 1.5, U_b = 4.5; ties Σ(t³−t) = 6;
    // σ² = (6/12)·(6 − 6/20) = 2.85; z = −1.5/√2.85 = −0.8885
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0))
      .map { case (arm, v) => ("g", arm, v) }
      .toDF("grp", "arm", "v")
    val r = AbTest.mannWhitney(df, "arm", "v", Seq("grp")).collect()(0)
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 2)
    assert(r.getAs[Double]("u_a") == 1.5 && r.getAs[Double]("u_b") == 4.5)
    assert(r.getAs[Double]("z_stat") == -0.8885)
  }

  test("mannWhitney: all-tied values emit null z; one-armed groups null statistics") {
    val df = Seq(("g", "a", 5.0), ("g", "b", 5.0), ("h", "a", 1.0))
      .toDF("grp", "arm", "v")
    val out = AbTest.mannWhitney(df, "arm", "v", Seq("grp"))
      .orderBy("grp").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("z_stat")))
    assert(out(1).isNullAt(out(1).fieldIndex("u_a")))
  }
}
