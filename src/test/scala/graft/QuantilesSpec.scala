package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantiles

/** Pins for exact histogram-path quantiles (SURVEY §2 row 164): the
  * PERCENTILE_DISC rank rule on a hand enumeration, duplicate-mass
  * handling, null/empty discipline, agreement with Spark's own exact
  * percentile on the corpus, refusals. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("hand enumeration: value at cum >= ceil(p*n)") {
    // 1..10: p=0.25 -> rank 3 -> 3; p=0.5 -> 5; p=0.99 -> 10; p=1 -> 10
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Quantiles.exact(df, "v", Seq("grp"), Seq(0.25, 0.5, 0.99, 1.0))
      .orderBy("p").collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    assert(out == Seq((0.25, 3.0), (0.5, 5.0), (0.99, 10.0), (1.0, 10.0)))
  }

  test("duplicate mass shifts ranks correctly") {
    // {1, 2, 2, 2, 9}: p=0.5 -> rank 3 -> 2; p=0.8 -> rank 4 -> 2;
    // p=0.81 -> rank 5 -> 9
    val df = Seq(1.0, 2.0, 2.0, 2.0, 9.0).map(("g", _)).toDF("grp", "v")
    val out = Quantiles.exact(df, "v", Seq("grp"), Seq(0.5, 0.8, 0.81))
      .orderBy("p").collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq
    assert(out == Seq((0.5, 2.0), (0.8, 2.0), (0.81, 9.0)))
  }

  test("matches Spark's buffering exact percentile on the corpus") {
    val e = Tables.events(spark, sfDir).where(col("value").isNotNull)
    val ours = Quantiles.exact(e, "value", Seq("event_type"), Seq(0.5))
      .select(col("event_type"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // percentile_disc-equivalent via sorted collect per group (test-only)
    val groups = e.select("event_type").distinct().collect().map(_.getString(0))
    groups.foreach { g =>
      val vals = e.filter(col("event_type") === g)
        .select(col("value").cast("decimal(18,4)").cast("double"))
        .collect().map(_.getDouble(0)).sorted
      val expect = vals(math.ceil(0.5 * vals.length).toInt - 1)
      assert(ours(g) == expect, s"group $g: ${ours(g)} vs $expect")
    }
  }

  test("nulls drop; empty groups emit nothing; refusals") {
    val df = Seq(("g", Option(1.0)), ("g", Option.empty[Double]),
      ("h", Option.empty[Double])).toDF("grp", "v")
    val out = Quantiles.exact(df, "v", Seq("grp"), Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(out == Seq(("g", 1.0)))
    intercept[IllegalArgumentException](
      Quantiles.exact(df, "v", Seq("grp"), Seq(0.0)))
    intercept[IllegalArgumentException](
      Quantiles.exact(df, "v", Seq("grp"), Seq(0.5, 0.5)))
  }

  test("percentRanks: ANSI rule with ties, min-rank sharing, single-row group") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 2.0), ("g", 3.0),
        ("h", 9.0))
      .toDF("grp", "v")
    val got = Quantiles.percentRanks(df, "v", Seq("grp"))
      .orderBy("grp", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    // g: n=4; ranks 1, 2 (tie), 4 → pr 0, 1/3, 1 ; h single row → 0
    assert(got.toSeq == Seq(
      ("g", 1.0, 4L, 0.0), ("g", 2.0, 4L, 0.333333), ("g", 3.0, 4L, 1.0),
      ("h", 9.0, 1L, 0.0)))
  }

  test("exactWeighted: mass-weighted rank rule, zero weights carry nothing, refusals") {
    import spark.implicits._
    // values (v, w): (1,1) (2,1) (10,8) — W=10; p=0.5 → cum >= 5 → 10;
    // p=0.2 → cum >= 2 → 2; a zero-weight row never shifts a threshold
    val df = Seq(("g", 1.0, 1L), ("g", 2.0, 1L), ("g", 10.0, 8L),
        ("g", 99.0, 0L))
      .toDF("grp", "v", "w")
    val got = Quantiles.exactWeighted(df, "v", "w", Seq("grp"), Seq(0.2, 0.5))
      .orderBy("p").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == Seq((0.2, 2.0), (0.5, 10.0)))
    val neg = Seq(("g", 1.0, -1L)).toDF("grp", "v", "w")
    intercept[Exception] {
      Quantiles.exactWeighted(neg, "v", "w", Seq("grp"), Seq(0.5)).collect()
    }
    intercept[IllegalArgumentException] {
      Quantiles.exactWeighted(df, "v", "w", Seq("grp"), Seq(0.5, 0.5))
    }
  }
}
