package graft

import org.apache.spark.sql.functions._

import graft.quality.Conformal

/** Pins for split-conformal intervals (SURVEY §2 row 161): the
  * degenerate constant-value case, the coverage guarantee band on a
  * deterministic spread, width monotonicity in alpha, and the
  * unattainable-guarantee refusal. */
class ConformalSpec extends SparkSpec {
  import spark.implicits._

  test("constant values: zero-width intervals, full coverage") {
    val df = (1L to 200L).map(i => (i, "g", 7.25)).toDF("id", "grp", "v")
    val r = Conformal.intervals(df, "id", "v", Seq("grp")).collect().head
    assert(r.getAs[Double]("model_mean") == 7.25)
    assert(r.getAs[Double]("qhat") == 0.0 && r.getAs[Double]("width") == 0.0)
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("coverage lands in the guarantee band on a deterministic spread") {
    val df = (1L to 4000L).map(i => (i, "g", (i % 100).toDouble))
      .toDF("id", "grp", "v")
    val r = Conformal.intervals(df, "id", "v", Seq("grp"), alpha = 0.1)
      .collect().head
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.85 && cov <= 0.97, s"coverage $cov outside the 1-alpha band")
    assert(r.getAs[Double]("width") > 0)
  }

  test("smaller alpha widens the interval (rank monotonicity)") {
    val df = (1L to 2000L).map(i => (i, "g", (i % 37).toDouble))
      .toDF("id", "grp", "v")
    val w10 = Conformal.intervals(df, "id", "v", Seq("grp"), alpha = 0.10)
      .collect().head.getAs[Double]("width")
    val w02 = Conformal.intervals(df, "id", "v", Seq("grp"), alpha = 0.02)
      .collect().head.getAs[Double]("width")
    assert(w02 >= w10, s"alpha 0.02 width $w02 must be >= alpha 0.10 width $w10")
  }

  test("unattainable guarantee refuses instead of silently undercovering") {
    // 60 keys split ~30/30; alpha = 0.01 needs n_calib >= 99 — impossible
    val df = (1L to 60L).map(i => (i, "g", i.toDouble)).toDF("id", "grp", "v")
    val e = intercept[Exception] {
      Conformal.intervals(df, "id", "v", Seq("grp"), alpha = 0.01).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("conformal guarantee unattainable") ||
        Option(e.getCause).exists(_.getMessage
          .contains("conformal guarantee unattainable"))),
      s"unexpected error: ${e.getMessage}")
  }

  test("parameter refusals") {
    val df = Seq((1L, "g", 1.0)).toDF("id", "grp", "v")
    intercept[IllegalArgumentException](
      Conformal.intervals(df, "id", "v", Seq("grp"), alpha = 0.0))
    intercept[IllegalArgumentException](
      Conformal.intervals(df, "id", "v", Seq("grp"), calibFraction = 1.0))
  }
}
