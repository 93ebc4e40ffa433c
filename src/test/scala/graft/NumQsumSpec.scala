package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Pins [[Num.qsum]]'s dual-long split sum against the DECIMAL(38,0)
  * reference form it replaced (FastText r14): the two must be
  * BIT-IDENTICAL — same quantized integer total, same nearest-double
  * recompose — and layout-independent, because the trained-model lanes
  * (FastText, Ivf/IvfPq/Pq Lloyd means, Pca moments) rely on exactly
  * that equivalence for the shuffle-determinism gate. */
class NumQsumSpec extends SparkSpec {
  import org.apache.spark.sql.Column

  /** The r14 reference: quantize to grid, sum as DECIMAL(38,0). */
  private def decQsum(x: Column, scale: Column): Column =
    sum(floor(x * scale + lit(0.5)).cast("long").cast(DecimalType(38, 0)))
      .cast(DoubleType) / scale

  private def fixture(parts: Int) = {
    import spark.implicits._
    // deterministic mixed-sign, mixed-magnitude values incl. exact ties
    val rnd = new scala.util.Random(42)
    val rows = (0 until 5000).map { i =>
      val g = i % 7
      val v = (rnd.nextDouble() - 0.5) * math.pow(10.0, i % 5) // up to ~1e4
      (g, v)
    } ++ Seq((0, 0.5e-12), (1, -0.5e-12), (2, 0.0)) // grid-tie edges
    rows.toDF("g", "x").repartition(parts)
  }

  test("qsum is bit-identical to the DECIMAL(38,0) reference form") {
    val df = fixture(4)
    val both = df.groupBy("g").agg(
      Num.qsum(col("x"), lit(1e12)).as("fast"),
      decQsum(col("x"), lit(1e12)).as("ref"),
      Num.qsum(col("x"), lit(1e9)).as("fast9"),
      decQsum(col("x"), lit(1e9)).as("ref9")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"grid 1e12 diverged for group ${r.get(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)),
        s"grid 1e9 diverged for group ${r.get(0)}")
    }
  }

  test("qsum and qmean are layout-independent") {
    def run(parts: Int): Map[Int, (Double, Double)] =
      fixture(parts).groupBy("g").agg(
        Num.qsum(col("x"), lit(1e12)).as("s"),
        Num.qmean(col("x"), lit(1e12)).as("m")).collect()
        .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val a = run(1)
    val b = run(13)
    assert(a == b, "qsum/qmean moved under a different partition layout")
  }

  test("qsum null semantics match sum()") {
    import spark.implicits._
    val df = Seq[(Int, Option[Double])](
      (0, Some(1.25)), (0, None), (1, None)).toDF("g", "x")
    val r = df.groupBy("g").agg(
      Num.qsum(col("x"), lit(1e12)).as("s")).orderBy("g").collect()
    assert(r(0).getDouble(1) == 1.25) // null skipped
    assert(r(1).isNullAt(1))          // all-null group -> null
  }
}
