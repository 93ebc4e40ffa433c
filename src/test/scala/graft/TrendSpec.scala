package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Trend

/** Pins for the per-group OLS trend (SURVEY §2 row 156): an exact-line
  * fixture, flat/degenerate groups, null discipline. */
class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(s"2025-01-0${day + 1} 00:00:00")

  test("points on an exact line recover slope/intercept/r2 exactly") {
    // y = 2x + 1 at x = 0, 1, 2 days.
    val df = Seq(("g", ts(0), 1.0), ("g", ts(1), 3.0), ("g", ts(2), 5.0))
      .toDF("grp", "t", "v")
    val r = Trend.ols(df, "t", "v", Seq("grp")).collect().head
    assert(r.getLong(1) == 3L)
    assert(r.getDouble(2) == 2.0, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0, s"intercept ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"r2 ${r.getDouble(4)}")
  }

  test("flat series: slope 0, r2 null (zero y-variance)") {
    val df = Seq(("g", ts(0), 4.0), ("g", ts(1), 4.0), ("g", ts(2), 4.0))
      .toDF("grp", "t", "v")
    val r = Trend.ols(df, "t", "v", Seq("grp")).collect().head
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 4.0)
    assert(r.isNullAt(4), "r2 must be null when dy = 0")
  }

  test("degenerate groups emit nulls, not division errors") {
    val df = Seq(
      ("single", ts(0), 1.0),                       // n = 1
      ("same_x", ts(0), 1.0), ("same_x", ts(0), 9.0)) // constant x
      .toDF("grp", "t", "v")
    val out = Trend.ols(df, "t", "v", Seq("grp")).orderBy("grp").collect()
    out.foreach { r =>
      assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4),
        s"degenerate group ${r.getString(0)} must fit to nulls")
    }
  }

  test("null timestamps and values drop before fitting") {
    val df = Seq(("g", Option(ts(0)), Option(1.0)),
      ("g", Option(ts(1)), Option(3.0)),
      ("g", Option.empty[Timestamp], Option(9.0)),
      ("g", Option(ts(2)), Option.empty[Double]))
      .toDF("grp", "t", "v")
    val r = Trend.ols(df, "t", "v", Seq("grp")).collect().head
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0)
  }

  test("noisy line: r2 strictly between 0 and 1, slope near truth") {
    val pts = (0 until 30).map(i =>
      ("g", Timestamp.valueOf(f"2025-01-${i + 1}%02d 00:00:00"),
        2.0 * i + 1.0 + (if (i % 2 == 0) 0.5 else -0.5)))
    val r = Trend.ols(pts.toDF("grp", "t", "v"), "t", "v", Seq("grp"))
      .collect().head
    assert(math.abs(r.getDouble(2) - 2.0) < 0.05)
    assert(r.getDouble(4) > 0.99 && r.getDouble(4) < 1.0)
  }

  test("theilSen: hand-computed median slope survives a wild day that wrecks OLS") {
    import java.sql.Timestamp
    def ts(day: Int) = new Timestamp(1704067200000L + day * 86400000L)
    // days 0..4 on y = 2x + 1, except day 3 explodes to 1000:
    // pairwise slopes {2 (most pairs), big ones through day 3} — the
    // median stays 2; OLS slope is dragged far above it
    val rows = Seq(0 -> 1.0, 1 -> 3.0, 2 -> 5.0, 3 -> 1000.0, 4 -> 9.0)
      .map { case (d, v) => ("g", ts(d), v) }
      .toDF("grp", "ts", "v")
    val out = graft.ops.Trend.theilSen(rows, "ts", "v", Seq("grp")).collect()(0)
    assert(out.getAs[Long]("n_days") == 5 && out.getAs[Long]("n_pairs") == 10)
    assert(out.getAs[Double]("slope") == 2.0)
    // intercept = disc median of residuals y - 2x: 1,1,1,994,1 -> 1
    assert(out.getAs[Double]("intercept") == 1.0)
    val ols = graft.ops.Trend.ols(rows, "ts", "v", Seq("grp")).collect()(0)
    assert(ols.getAs[Double]("slope") > 50.0, "fixture must actually wreck OLS")
  }

  test("theilSen: single-day groups emit zero pairs and null slope") {
    import java.sql.Timestamp
    val rows = Seq(("g", new Timestamp(1704067200000L), 5.0))
      .toDF("grp", "ts", "v")
    val out = graft.ops.Trend.theilSen(rows, "ts", "v", Seq("grp")).collect()(0)
    assert(out.getAs[Long]("n_pairs") == 0 && out.isNullAt(out.fieldIndex("slope")))
  }

  test("mannKendall: hand-computed S, tie correction, and z") {
    // daily means 1, 3, 2, 2, 5 over days 0..4:
    // pairs (i<j): signs = +(1,3) +(1,2) +(1,2) +(1,5) -(3,2) -(3,2)
    //              +(3,5) 0(2,2) +(2,5) +(2,5) → S = 7 - 2 = 5
    // ties: one group of t=2 (the 2s) → corr = 2·1·9 = 18
    // Var = (5·4·15 − 18)/18 = 282/18; z = (5−1)/sqrt(282/18)
    val rows = Seq(0 -> 1.0, 1 -> 3.0, 2 -> 2.0, 3 -> 2.0, 4 -> 5.0)
      .map { case (d, v) => ("g", ts(d), v) }.toDF("grp", "ts", "v")
    val out = Trend.mannKendall(rows, "ts", "v", Seq("grp")).collect()(0)
    assert(out.getAs[Long]("n_days") == 5)
    assert(out.getAs[Long]("s") == 5L, s"S = ${out.getAs[Long]("s")}")
    assert(math.abs(out.getAs[Double]("var_s") - 282.0 / 18) < 1e-6)
    val zExp = 4.0 / math.sqrt(282.0 / 18)
    assert(math.abs(out.getAs[Double]("z") - zExp) < 1e-6)
    // constant series: every pair ties → Var 0 → null z
    val flat = Seq(0, 1, 2).map(d => ("g", ts(d), 4.0)).toDF("grp", "ts", "v")
    val f = Trend.mannKendall(flat, "ts", "v", Seq("grp")).collect()(0)
    assert(f.getAs[Long]("s") == 0L && f.isNullAt(f.fieldIndex("z")))
  }

  test("acf: alternating series — negative at lag 1, positive at lag 2") {
    // daily means alternate 1, 3, 1, 3, 1, 3 → e alternates -1, +1;
    // lag-1 products all -1 (acf -5/5·... num=-5, den=6 → -0.833333);
    // lag-2 products all +1 → acf = 4/6
    val rows = (0 until 6).map(d => ("g", ts(d), if (d % 2 == 0) 1.0 else 3.0))
      .toDF("grp", "ts", "v")
    val out = Trend.acf(rows, "ts", "v", Seq("grp"), maxLag = 2)
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(out(1)._1 == 5 && out(2)._1 == 4)
    assert(math.abs(out(1)._2 - (-5.0 / 6)) < 1e-6, s"lag1 ${out(1)}")
    assert(math.abs(out(2)._2 - 4.0 / 6) < 1e-6, s"lag2 ${out(2)}")
    // missing day: pairs only form where both endpoints exist
    val gappy = Seq(0, 1, 3).map(d => ("g", ts(d), d.toDouble))
      .toDF("grp", "ts", "v")
    val g = Trend.acf(gappy, "ts", "v", Seq("grp"), maxLag = 1).collect()(0)
    assert(g.getAs[Long]("n_pairs") == 1, "only (0,1) pairs at lag 1")
    // zero-variance series → null acf
    val flat = Seq(0, 1, 2).map(d => ("g", ts(d), 2.0)).toDF("grp", "ts", "v")
    val fl = Trend.acf(flat, "ts", "v", Seq("grp"), maxLag = 1).collect()(0)
    assert(fl.isNullAt(fl.fieldIndex("acf")))
  }

  test("dispersion: hand-computed Fano; constant-rate series sits at 0") {
    // daily counts 1, 3, 2 → total 6, mean 2, var = ((1+9+4) - 36/3)/2 = 1
    val rows = (Seq.fill(1)(0) ++ Seq.fill(3)(1) ++ Seq.fill(2)(2))
      .map(d => ("g", ts(d), 1.0)).toDF("grp", "ts", "v")
    val r = Trend.dispersion(rows, "ts", Seq("grp")).collect()(0)
    assert(r.getAs[Long]("n_days") == 3 && r.getAs[Long]("total") == 6)
    assert(r.getAs[Double]("mean") == 2.0)
    assert(r.getAs[Double]("variance") == 1.0)
    assert(r.getAs[Double]("fano") == 0.5)
    // perfectly regular traffic: zero variance → fano 0
    val flat = (0 until 3).flatMap(d => Seq.fill(4)(d))
      .map(d => ("g", ts(d), 1.0)).toDF("grp", "ts", "v")
    val f = Trend.dispersion(flat, "ts", Seq("grp")).collect()(0)
    assert(f.getAs[Double]("fano") == 0.0)
    // single-day groups emit null variance/fano, not a 0/0
    val one = Seq(("g", ts(0), 1.0)).toDF("grp", "ts", "v")
    val o = Trend.dispersion(one, "ts", Seq("grp")).collect()(0)
    assert(o.isNullAt(o.fieldIndex("variance")) && o.isNullAt(o.fieldIndex("fano")))
  }
}
