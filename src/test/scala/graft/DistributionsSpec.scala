package graft

import graft.profile.Distributions
import org.apache.spark.sql.functions.{col, max, min}

class DistributionsSpec extends SparkSpec {
  import spark.implicits._

  test("histogram bins uniformly, clamps max into last bin, skips nulls") {
    val df = ((1 to 10).map(i => Some(i.toDouble)) :+ None).toDF("x")
    val h = Distributions.histogram(df, Seq("x"), bins = 3).collect()
    // width = 3: bins [1,4) [4,7) [7,10], value 10 clamped into bin 2
    assert(h.map(r => r.getInt(1) -> r.getLong(4)).toMap == Map(0 -> 3, 1 -> 3, 2 -> 4))
    assert(h.map(_.getLong(4)).sum == 10) // null excluded
    val first = h.find(_.getInt(1) == 0).get
    assert(first.getDouble(2) == 1.0 && first.getDouble(3) == 4.0)
  }

  test("histogram collapses a constant column into bin 0") {
    val df = Seq(5.0, 5.0, 5.0).toDF("x")
    val h = Distributions.histogram(df, Seq("x"), bins = 4).collect()
    assert(h.length == 1 && h.head.getInt(1) == 0 && h.head.getLong(4) == 3)
  }

  test("correlationMatrix: exact path recovers known correlations") {
    val df = (1 to 100).map(i => (i.toDouble, 2.0 * i + 1.0, -3.0 * i, 7.0))
      .toDF("a", "b", "c", "d")
    val m = Distributions.correlationMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("a", "b")) == 1.0)
    assert(m(("a", "c")) == -1.0)
    assert(m(("b", "c")) == -1.0)
  }

  test("correlationMatrix: exact and approx paths agree at 4dp on real data") {
    val df = Tables.lineitem(spark, sfDir)
    val cols = Seq("l_quantity", "l_extendedprice", "l_tax")
    val ex = Distributions.correlationMatrix(df, cols, exact = true)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val ap = Distributions.correlationMatrix(df, cols, exact = false)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(ex.keySet == ap.keySet)
    ex.foreach { case (k, v) => assert(math.abs(v - ap(k)) <= 2e-4, s"$k: $v vs ${ap(k)}") }
  }

  test("correlationMatrix uses pairwise-complete rows (pandas semantics)") {
    // b's null row must drop that row from the (a,b) pair only
    val df = Seq((1.0, Some(2.0), 1.0), (2.0, None, 2.0), (3.0, Some(1.0), 5.0))
      .toDF("a", "b", "c")
    val m = Distributions.correlationMatrix(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("a", "b")) == -1.0) // two complete rows: (1,2),(3,1) → perfectly anti
    assert(m(("a", "c")) > 0.9)   // all three rows
  }

  test("spearmanMatrix: monotone ±1, tie averaging, constant → null") {
    // x vs exp(x): nonlinear but perfectly monotone → Spearman exactly 1
    // (Pearson would be < 1); inverse ordering → exactly −1.
    val df = Seq.tabulate(20)(i =>
      (i.toDouble, math.exp(i / 3.0), -i.toDouble, 5.0))
      .toDF("x", "expx", "neg", "const")
    val m = Distributions.spearmanMatrix(df, Seq("x", "expx", "neg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(m(("x", "expx")).contains(1.0))
    assert(m(("x", "neg")).contains(-1.0))
    assert(m(("x", "const")).isEmpty, "zero rank variance → null")

    // tie averaging: [1,1,2] vs [3,5,9]: ranks a = (1.5, 1.5, 3),
    // b = (1,2,3) → rho = (2·1.5+9·3 … ) = 0.866 at 4dp
    val ties = Seq((1.0, 3.0), (1.0, 5.0), (2.0, 9.0)).toDF("a", "b")
    val rho = Distributions.spearmanMatrix(ties, Seq("a", "b"))
      .collect()(0).getDouble(2)
    assert(math.abs(rho - 0.8660) < 1e-9)
  }

  test("spearmanMatrix quantize-first: rank-window input bounded, rho tracks exact") {
    // 2000 distinct doubles per column — the exact path's cumulative rank
    // window sorts all 2000; quantize=64 must cap it at 64 buckets while
    // keeping the statistic close on a monotone pair.
    val df = Seq.tabulate(2000)(i => (i * 0.37, i * 0.74 + 1.0)).toDF("a", "b")
    val exact = Distributions.spearmanMatrix(df, Seq("a", "b"))
      .collect()(0).getDouble(2)
    val approx = Distributions.spearmanMatrix(df, Seq("a", "b"), quantize = 64)
      .collect()(0).getDouble(2)
    assert(exact == 1.0)
    assert(approx > 0.999, s"quantized rho $approx strayed from exact 1.0")
    // the bound the scale path relies on: the quantize expression collapses
    // the full support into <= q distinct buckets — that set IS the
    // cumulative rank window's input
    val bounds = df.agg(min(col("a")).as("lo"), max(col("a")).as("hi"))
    val support = df.crossJoin(bounds)
      .select(Distributions.quantizeExpr(col("a"), col("lo"), col("hi"), 64).as("v"))
      .distinct().count()
    assert(support <= 64)
  }

  test("gini: hand-computed tied-block rank form, top share, refusals") {
    import spark.implicits._
    // values {1,1,2,4}: n=4, S_v=8; rank sums: block(1)c=2 ranks{1,2}→3,
    // block(2) rank 3, block(4) rank 4 → S_rv = 1·3+2·3+4·4 = 25;
    // G = 2·25/(4·8) − 5/4 = 0.3125; top 25% (k=1) mass = 4 → share 0.5
    val df = Seq(1.0, 1.0, 2.0, 4.0).map(("g", _)).toDF("grp", "v")
    val r = graft.profile.Distributions.gini(df, "v", Seq("grp"),
      topFraction = 0.25).collect()(0)
    assert(r.getAs[Long]("n") == 4 && r.getAs[Double]("total") == 8.0)
    assert(r.getAs[Double]("gini") == 0.3125)
    assert(r.getAs[Double]("top_share") == 0.5)
    // all-zero group: defined total, null gini (no mass to concentrate)
    val z = graft.profile.Distributions.gini(
      Seq(0.0, 0.0).map(("g", _)).toDF("grp", "v"), "v", Seq("grp"))
      .collect()(0)
    assert(z.isNullAt(z.fieldIndex("gini")))
    // negative values refuse loudly
    val neg = Seq(("g", -1.0)).toDF("grp", "v")
    intercept[Exception] {
      graft.profile.Distributions.gini(neg, "v", Seq("grp")).collect()
    }
    intercept[IllegalArgumentException] {
      graft.profile.Distributions.gini(df, "v", Seq("grp"), topFraction = 1.5)
    }
  }
}
