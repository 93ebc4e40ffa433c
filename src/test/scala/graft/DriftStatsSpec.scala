package graft

import graft.drift.Drift
import org.apache.spark.sql.functions._

class DriftStatsSpec extends SparkSpec {
  import spark.implicits._

  test("psi is ~0 for identical distributions and positive under shift") {
    val base = (1 to 1000).map(_.toDouble).toDF("x")
    val same = Drift.psi(base, base, "x", bins = 10).collect()
    assert(same.length == 10)
    same.foreach(r => assert(math.abs(r.getAs[Double]("psi_term")) < 1e-9))
    assert(math.abs(same.head.getAs[Double]("psi_total")) < 1e-6)

    val shifted = (1 to 1000).map(i => i.toDouble + 500).toDF("x")
    val moved = Drift.psi(base, shifted, "x", bins = 10).collect()
    assert(moved.head.getAs[Double]("psi_total") > 0.25, "major shift flagged")
  }

  test("psi bins: every bin id present, empty bins hit the epsilon clamp") {
    val base = (1 to 100).map(_.toDouble).toDF("x")
    val narrow = Seq.fill(50)(1.0).toDF("x") // all target mass in bin 0
    val rows = Drift.psi(base, narrow, "x", bins = 5).collect()
    assert(rows.map(_.getAs[Int]("bin_id")).toSeq == (0 until 5))
    val bin0 = rows.head
    assert(bin0.getAs[Double]("target_pct") == 1.0)
    assert(rows.last.getAs[Double]("target_pct") == 0.0)
    assert(rows.last.getAs[Double]("psi_term") > 0.0, "emptied bin contributes")
  }

  test("psi survives a constant base column (zero bin width)") {
    val const = Seq.fill(20)(7.0).toDF("x")
    val spread = (1 to 20).map(_.toDouble).toDF("x")
    val rows = Drift.psi(const, spread, "x", bins = 4).collect()
    assert(rows.length == 4)
    assert(rows.head.getAs[Double]("base_pct") == 1.0)
    assert(rows.head.getAs[Double]("target_pct") == 1.0) // all target in bin 0 too
  }

  test("psi survives target outliers far outside the base range (no ANSI overflow)") {
    val base = (1 to 100).map(_ / 100.0).toDF("x") // width 0.099/10 per bin
    val wild = Seq(1e18, -1e18, 0.5).toDF("x")     // unclamped floor ≫ Int.MaxValue
    val rows = Drift.psi(base, wild, "x", bins = 10).collect()
    assert(rows.length == 10)
    assert(rows.head.getAs[Double]("target_pct") > 0.3)  // -1e18 clamped to bin 0
    assert(rows.last.getAs[Double]("target_pct") > 0.3)  // 1e18 clamped to bin 9
  }

  test("one-sided-empty drift signals null, not 0/NaN") {
    val a = (1 to 50).map(_.toDouble).toDF("x")
    val none = Seq.empty[Double].toDF("x")
    val psiRows = Drift.psi(none, a, "x", bins = 4).collect()
    assert(psiRows.forall(_.isNullAt(4)), "psi_total null when base empty")
    assert(Drift.ks(a, none, "x").collect()(0).isNullAt(1))
    assert(Drift.ks(none, a, "x").collect()(0).isNullAt(1))
  }

  test("ks is 0 for identical, 1 for disjoint, in between for overlap") {
    val a = (1 to 500).map(_.toDouble).toDF("x")
    val b = (501 to 1000).map(_.toDouble).toDF("x")
    assert(Drift.ks(a, a, "x").collect().head.getAs[Double]("ks_stat") == 0.0)
    assert(Drift.ks(a, b, "x").collect().head.getAs[Double]("ks_stat") == 1.0)
    val mixed = ((1 to 250) ++ (501 to 750)).map(_.toDouble).toDF("x")
    val d = Drift.ks(a, mixed, "x").collect().head.getAs[Double]("ks_stat")
    assert(d > 0.0 && d < 1.0)
  }

  test("ks quantize-first: window input bounded, statistic tracks exact") {
    // shift of 400 over n=2000 → exact KS = 0.2; with 100 pooled-range
    // buckets the CDFs move by at most one bucket's mass (~0.012/side)
    val a = (1 to 2000).map(_.toDouble).toDF("x")
    val shifted = (1 to 2000).map(i => i + 400.0).toDF("x")
    val exact = Drift.ks(a, shifted, "x").collect().head.getAs[Double]("ks_stat")
    val approx = Drift.ks(a, shifted, "x", quantize = 100)
      .collect().head.getAs[Double]("ks_stat")
    assert(exact == 0.2)
    assert(math.abs(exact - approx) < 0.05, s"quantized KS $approx vs exact $exact")
    // identical sides stay exactly 0 under quantization; disjoint stay 1
    assert(Drift.ks(a, a, "x", quantize = 50)
      .collect().head.getAs[Double]("ks_stat") == 0.0)
    val far = (10001 to 12000).map(_.toDouble).toDF("x")
    assert(Drift.ks(a, far, "x", quantize = 50)
      .collect().head.getAs[Double]("ks_stat") == 1.0)
  }

  test("psiByPeriod scores each period on the base grid") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("x")
    // period 1 mirrors the base; period 2 collapses to the top decile;
    // period 3 is an all-null outage month
    val target = ((1 to 1000).map(i => (Some((i % 100).toDouble), 1)) ++
      (1 to 500).map(i => (Some(90.0 + i % 10), 2)) ++
      (1 to 50).map(_ => (Option.empty[Double], 3))).toDF("x", "p")
    val out = Drift.psiByPeriod(base, target, "x", "p", bins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]).getOrElse(Double.NaN))).toMap
    assert(out(1)._1 === 1000L && out(2)._1 === 500L)
    assert(out(1)._2 < 0.01, s"identical period drifted: ${out(1)}")
    assert(out(2)._2 > 0.25, s"collapsed period not flagged: ${out(2)}")
    // the outage month SURFACES as (period, 0, null), never an omitted row
    assert(out.contains(3) && out(3)._1 === 0L)
    // empty base -> null totals, not zeros — while n_target keeps the
    // REAL per-period row counts (null bounds bin rows, never drop them)
    val nulls = Drift.psiByPeriod(base.limit(0), target, "x", "p", bins = 10)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.isNullAt(2))).toMap
    assert(nulls(1) === ((1000L, true)) && nulls(2) === ((500L, true)))
  }

  test("divergencesByPeriod scores JS/Hellinger/TV per period on the base grid") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("x")
    val target = ((1 to 1000).map(i => (Some((i % 100).toDouble), 1)) ++
      (1 to 500).map(i => (Some(90.0 + i % 10), 2)) ++
      (1 to 50).map(_ => (Option.empty[Double], 3))).toDF("x", "p")
    val out = Drift.divergencesByPeriod(base, target, "x", "p", bins = 10)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    // identical period: all three ~0
    assert(out(1)._2.get < 1e-6 && out(1)._3.get < 1e-3 && out(1)._4.get < 1e-6,
      s"identical period drifted: ${out(1)}")
    // collapsed period: JS near ln2·(9/10 of mass moved), TV = 0.9
    assert(out(2)._2.get > 0.4 && out(2)._4.get === 0.9,
      s"collapsed period not flagged: ${out(2)}")
    assert(out(2)._3.get > 0.5)
    // outage month surfaces as (period, 0, null, null, null)
    assert(out(3) === ((0L, None, None, None)))
  }

  test("cvmByPeriod scores each period against the same base reference") {
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("x")
    // period 1 mirrors the base; period 2 collapses to the top decile
    val target = ((1 to 1000).map(i => ((i % 100).toDouble, 1)) ++
      (1 to 500).map(i => (90.0 + i % 10, 2))).toDF("x", "p")
    val out = Drift.cvmByPeriod(base, target, "x", "p")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("cvm_stat"))).toMap
    assert(out(1)._1 == 1000L && out(1)._2 == 1000L)
    assert(out(1)._3 < 1e-6, s"identical period drifted: ${out(1)}")
    // CvM is normalized by (nb+nt)² — a full decile collapse lands near
    // 0.06, orders of magnitude above the identical period's ~0
    assert(out(2)._3 > 0.03, s"collapsed period not flagged: ${out(2)}")
    // the per-period stat must equal the pairwise cvm() of that slice —
    // the time-series form is the same statistic, not a variant
    val solo = Drift.cvm(base, target.filter(col("p") === 2).select("x"), "x")
      .collect().head.getAs[Double]("cvm_stat")
    assert(out(2)._3 == solo, s"period-2 ${out(2)._3} != pairwise $solo")
    // quantized lane: bounded support, statistic tracks exact
    val q = Drift.cvmByPeriod(base, target, "x", "p", quantize = 20)
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("cvm_stat")).toMap
    assert(q(1) < 1e-6 && math.abs(q(2) - out(2)._3) < 0.05)
  }

  test("ksFdrByPeriod: identical periods accept, a shifted period rejects") {
    val base = (1 to 2000).map(_.toDouble).toDF("x")
    // periods 1-3 resample the base; period 4 is a hard shift
    val target = ((1 to 2000).map(i => ((i % 2000 + 1).toDouble, 1)) ++
      (1 to 2000).map(i => ((i % 1999 + 1).toDouble, 2)) ++
      (1 to 2000).map(i => ((i % 1997 + 1).toDouble, 3)) ++
      (1 to 2000).map(i => (i + 1500.0, 4))).toDF("x", "p")
    val out = Drift.ksFdrByPeriod(base, target, "x", "p", q = 0.05)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Double]("p_value"), r.getAs[Boolean]("reject"))).toMap
    assert(out(4)._2, s"shifted period not rejected: ${out(4)}")
    assert(!out(1)._2 && !out(2)._2 && !out(3)._2,
      s"near-identical periods falsely rejected: $out")
    // p-values are proper probabilities and ordered sensibly
    assert(out(4)._1 < 0.001 && out(1)._1 > 0.5)
    // the whole family null: nothing rejects
    val same = Drift.ksFdrByPeriod(base,
        (1 to 2000).map(i => (i.toDouble, 1)).toDF("x", "p"), "x", "p")
      .collect()
    assert(same.forall(!_.getAs[Boolean]("reject")))
  }

  test("psiAll scores every column in one melted pass") {
    val base = (1 to 1000).map(i => ((i % 100).toDouble, (i % 50).toDouble))
      .toDF("a", "b")
    // column a unchanged; column b collapses to its top values
    val target = (1 to 1000).map(i => ((i % 100).toDouble, 45.0 + i % 5))
      .toDF("a", "b")
    val out = Drift.psiAll(base, target, Seq("a", "b"), bins = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("psi_total"))).toMap
    assert(out("a")._1 === 1000L && out("a")._2 === 1000L)
    assert(out("a")._3 < 0.01, s"stable column drifted: ${out("a")}")
    assert(out("b")._3 > 0.25, s"collapsed column not flagged: ${out("b")}")
    // a column null on one side reports null psi, not a zero
    val halfNull = Drift.psiAll(base,
      target.withColumn("b", lit(null).cast("double")), Seq("a", "b"))
      .collect().map(r => r.getString(0) -> r.isNullAt(3)).toMap
    assert(!halfNull("a") && halfNull("b"))
  }

  test("divergence pack hits the closed-form endpoints") {
    // identical distributions: every divergence is exactly zero
    val base = (1 to 1000).map(i => (i % 100).toDouble).toDF("x")
    val same = Drift.divergences(base, base, "x", bins = 10).collect()
    assert(same.forall(r => r.getAs[Double]("js_div") == 0.0 &&
      r.getAs[Double]("hellinger") == 0.0 && r.getAs[Double]("tv_dist") == 0.0))
    // disjoint supports (base fills bins 0-4 and 9 — the 9 via the single
    // bounds-widening point at 99 — target fills bins 5-8 only): JS = ln 2,
    // Hellinger = 1, TV = 1 — the maxima
    val lo = (1 to 500).map(i => (i % 50).toDouble).toDF("x")
    val hiT = (1 to 500).map(i => 50.0 + i % 40).toDF("x")
    val wide = lo.union(Seq(99.0).toDF("x"))
    val far = Drift.divergences(wide, hiT, "x", bins = 10).collect()
    val js = far.head.getAs[Double]("js_div")
    assert(math.abs(js - math.log(2.0)) < 1e-3, s"disjoint JS was $js")
    assert(math.abs(far.head.getAs[Double]("hellinger") - 1.0) < 1e-3)
    assert(math.abs(far.head.getAs[Double]("tv_dist") - 1.0) < 1e-3)
    // an empty side nulls the totals (mirrors the psi discipline)
    val empty = Drift.divergences(base, base.limit(0), "x", bins = 10).collect()
    assert(empty.forall(r => r.isNullAt(r.fieldIndex("js_div")) &&
      r.isNullAt(r.fieldIndex("hellinger")) && r.isNullAt(r.fieldIndex("tv_dist"))))
  }

  test("cvm: hand-computed discrete statistic; identical samples score zero; body shift registers") {
    import spark.implicits._
    val b = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val t = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val same = graft.drift.Drift.cvm(b, t, "x").collect()(0)
    assert(same.getAs[Double]("cvm_stat") == 0.0)
    // hand case: base {1,2}, target {3,4} — pooled values 1..4, p_k=1/4;
    // F_b = 0.5,1,1,1; F_t = 0,0,0.5,1 → squared gaps 0.25,1,0.25,0 →
    // Σ·p = 0.375; factor = 2·2/16 = 0.25 → T = 0.09375
    val d = graft.drift.Drift.cvm(
      Seq(1.0, 2.0).toDF("x"), Seq(3.0, 4.0).toDF("x"), "x").collect()(0)
    assert(d.getAs[Long]("n_base") == 2 && d.getAs[Long]("n_target") == 2)
    assert(math.abs(d.getAs[Double]("cvm_stat") - 0.09375) < 1e-6)
    // an empty side yields null, not NaN
    val e = graft.drift.Drift.cvm(
      Seq.empty[Double].toDF("x"), Seq(1.0).toDF("x"), "x").collect()(0)
    assert(e.isNullAt(e.fieldIndex("cvm_stat")))
  }
}
