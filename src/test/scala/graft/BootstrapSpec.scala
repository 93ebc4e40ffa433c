package graft

import org.apache.spark.sql.functions._

import graft.ops.Bootstrap

/** Pins for the Poisson bootstrap (SURVEY §2 row 153): the inverse-CDF
  * ladder at its exact integer boundaries, weight-mean sanity, the
  * degenerate constant-value CI, CI-width shrinkage with n,
  * reproducibility, and the refusal ladder. */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("Poisson(1) ladder: exact boundary behavior") {
    val buckets = Seq(0L, 367878L, 367879L, 735757L, 735758L, 999405L,
      999997L, 999998L, 999999L)
    val out = buckets.toDF("bkt")
      .select(Bootstrap.poissonWeight(col("bkt")).as("w"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(0L, 0L, 1L, 1L, 2L, 6L, 8L, 9L, 9L))
  }

  test("weights average ~1 over many independent draws") {
    val df = spark.range(20000).toDF("k")
      .select(explode(sequence(lit(0), lit(3))).as("b"), col("k"))
      .select(Bootstrap.poissonWeight(
        Bootstrap.replicateBucket(col("k"), col("b"), 0L)).as("w"))
    val mean = df.agg(avg("w")).collect().head.getDouble(0)
    assert(math.abs(mean - 1.0) < 0.02, s"Poisson(1) mean drifted: $mean")
  }

  test("constant values: CI collapses to the observed mean") {
    val df = (1L to 500L).map(i => (i, "g", 7.5)).toDF("id", "grp", "v")
    val out = Bootstrap.ciMean(df, "id", "v", Seq("grp"), replicates = 32)
      .collect().head
    assert(out.getDouble(2) == 7.5 && out.getDouble(3) == 7.5 &&
      out.getDouble(4) == 7.5)
  }

  test("CI width shrinks with group size; observed mean inside") {
    val small = (1L to 20L).map(i => (i, "small", (i % 10).toDouble))
    val big = (1L to 2000L).map(i => (i, "big", (i % 10).toDouble))
    val df = (small ++ big).toDF("id", "grp", "v")
    val rows = Bootstrap.ciMean(df, "id", "v", Seq("grp"), replicates = 64)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (obsS, loS, hiS) = rows("small")
    val (obsB, loB, hiB) = rows("big")
    assert(loS <= obsS && obsS <= hiS)
    assert(loB <= obsB && obsB <= hiB)
    assert(hiS - loS > hiB - loB,
      s"width(small)=${hiS - loS} must exceed width(big)=${hiB - loB}")
  }

  test("reproducible under one seed; seed changes the replicate draws") {
    val df = (1L to 300L).map(i => (i, "g", (i % 7).toDouble)).toDF("id", "grp", "v")
    val a = Bootstrap.ciMean(df, "id", "v", Seq("grp"), replicates = 32)
      .collect().head.toString
    val b = Bootstrap.ciMean(df, "id", "v", Seq("grp"), replicates = 32)
      .collect().head.toString
    val c = Bootstrap.ciMean(df, "id", "v", Seq("grp"), replicates = 32,
      seedBase = 777L).collect().head.toString
    assert(a == b, "same seed must reproduce exactly")
    assert(a != c, "a different seedBase must change the draws")
  }

  test("ciRatio: correlated draws make a constant per-row ratio exact") {
    // num = den/2 on every row: ANY reweighting that applies the SAME
    // weight to both sides yields exactly 0.5 — a per-side bootstrap
    // would not. The CI must collapse to the point.
    val df = (1L to 400L).map(i => (i, "g", 3.0, 6.0)).toDF("id", "grp", "num", "den")
    val r = Bootstrap.ciRatio(df, "id", "num", "den", Seq("grp"),
      replicates = 32).collect().head
    assert(r.getDouble(2) == 0.5 && r.getDouble(3) == 0.5 && r.getDouble(4) == 0.5)
  }

  test("refusals") {
    val df = Seq((1L, "g", 1.0)).toDF("id", "grp", "v")
    intercept[IllegalArgumentException](
      Bootstrap.ciMean(df, "id", "v", Seq("grp"), replicates = 4))
    intercept[IllegalArgumentException](
      Bootstrap.ciMean(df, "id", "v", Seq("grp"), alpha = 0.5))
    intercept[IllegalArgumentException](
      Bootstrap.ciMean(df, "id", "v", Seq("grp"), seedBase = 999999L))
    intercept[IllegalArgumentException](
      Bootstrap.ciMean(df.withColumn("id", col("id").cast("string")),
        "id", "v", Seq("grp")))
  }
}
