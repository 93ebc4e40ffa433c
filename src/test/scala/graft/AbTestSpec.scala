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
}
