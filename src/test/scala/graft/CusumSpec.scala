package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.drift.Cusum

/** Pins for CUSUM changepoint detection (SURVEY §2 row 159): a
  * hand-traced level shift through the prefix-sum closed form, the
  * symmetric downward case, the max(0,·) reset, first-alarm reporting,
  * null discipline and refusals. */
class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def t(i: Int): Timestamp =
    new Timestamp(1700000000000L + i * 60000L)

  test("hand-traced upward level shift") {
    // x = 0,0,0,0,10,10,10; target 0, slack 1:
    // d = -1·4, 9·3 → P = -1,-2,-3,-4,5,14,23; runmin = -1..-4,-4,-4,-4
    // C+ = 0,0,0,0,9,18,27 — alarm (h=15) from the 6th point on.
    val xs = Seq(0.0, 0.0, 0.0, 0.0, 10.0, 10.0, 10.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("g", t(i), i.toLong, v) }
      .toDF("grp", "ts", "id", "v")
    val out = Cusum.detect(df, "v", "ts", "id", Seq("grp"),
        target = 0.0, slack = 1.0, threshold = 15.0)
      .orderBy("id").collect()
    assert(out.map(_.getAs[Double]("cusum_up")).toSeq ==
      Seq(0.0, 0.0, 0.0, 0.0, 9.0, 18.0, 27.0))
    assert(out.map(_.getAs[Double]("cusum_down")).toSeq == Seq.fill(7)(0.0))
    assert(out.map(_.getAs[Boolean]("alarm")).toSeq ==
      Seq(false, false, false, false, false, true, true))
    val cp = Cusum.changepoints(df, "v", "ts", "id", Seq("grp"),
      target = 0.0, slack = 1.0, threshold = 15.0).collect()
    assert(cp.length == 1 && cp.head.getAs[Long]("id") == 5L &&
      cp.head.getAs[Double]("cusum_up") == 18.0)
  }

  test("downward shift drives cusum_down; C+ resets at zero") {
    val xs = Seq(10.0, 10.0, 0.0, 0.0, 0.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("g", t(i), i.toLong, v) }
      .toDF("grp", "ts", "id", "v")
    val out = Cusum.detect(df, "v", "ts", "id", Seq("grp"),
        target = 10.0, slack = 1.0, threshold = 5.0)
      .orderBy("id").collect()
    // d_down = (10-1-x): -1,-1,9,9,9 → C- = 0,0,9,18,27
    assert(out.map(_.getAs[Double]("cusum_down")).toSeq ==
      Seq(0.0, 0.0, 9.0, 18.0, 27.0))
    // C+ never goes negative (max(0,·) via the running-min form)
    assert(out.map(_.getAs[Double]("cusum_up")).forall(_ == 0.0))
  }

  test("series are independent per group; nulls carry no evidence") {
    val df = Seq(
      ("a", t(0), 0L, Option(5.0)), ("a", t(1), 1L, Option.empty[Double]),
      ("a", t(2), 2L, Option(5.0)),
      ("b", t(0), 0L, Option(100.0))).toDF("grp", "ts", "id", "v")
    val out = Cusum.detect(df, "v", "ts", "id", Seq("grp"),
      target = 5.0, slack = 1.0, threshold = 50.0)
    assert(out.count() == 3) // the null row is out of the series
    val b = out.filter(col("grp") === "b").collect().head
    assert(b.getAs[Double]("cusum_up") == 94.0) // 100 - 5 - 1
    assert(b.getAs[Boolean]("alarm"))
  }

  test("refusals: negative slack, non-positive threshold, sub-4dp params") {
    val df = Seq(("g", t(0), 0L, 1.0)).toDF("grp", "ts", "id", "v")
    intercept[IllegalArgumentException](Cusum.detect(df, "v", "ts", "id",
      Seq("grp"), target = 0.0, slack = -1.0, threshold = 1.0))
    intercept[IllegalArgumentException](Cusum.detect(df, "v", "ts", "id",
      Seq("grp"), target = 0.0, slack = 0.0, threshold = 0.0))
    intercept[IllegalArgumentException](Cusum.detect(df, "v", "ts", "id",
      Seq("grp"), target = 1e-7, slack = 0.0, threshold = 1.0))
  }
}
