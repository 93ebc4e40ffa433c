package graft

import graft.functions.GraftFunctions
import graft.sim.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

class VecCosineSpec extends SparkSpec {
  import spark.implicits._

  private def zipWithCosine(a: org.apache.spark.sql.Column,
                            b: org.apache.spark.sql.Column) = {
    def d(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  test("native vec_cosine is bit-identical to the zip_with formulation") {
    val df = (0 until 50).map { i =>
      (Array.tabulate(17)(d => math.sin(i * 31 + d).toFloat),
        Array.tabulate(17)(d => math.cos(i * 13 + d).toFloat))
    }.toDF("a", "b")
    val rows = df.select(
      GraftFunctions.vecCosine(col("a"), col("b")).as("native"),
      zipWithCosine(col("a"), col("b")).as("composed")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1))) // exact
  }

  test("orthogonal=0, identical=1, double arrays too") {
    val df = Seq(
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(3.0, 4.0), Array(3.0, 4.0))).toDF("a", "b")
    val v = df.select(GraftFunctions.vecCosine(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(v(0) == 0.0 && v(1) == 1.0)
  }

  test("null semantics: null array, null element, length mismatch -> null") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(1.0f, 2.0f, 3.0f))), // length mismatch
      (None, Some(Array(1.0f)))                                 // null array
    ).toDF("a", "b")
    val v = df.select(GraftFunctions.vecCosine(col("a"), col("b"))).collect()
    assert(v.forall(_.isNullAt(0)))
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS DOUBLE), CAST(NULL AS DOUBLE))").toDF("a")
      .select(GraftFunctions.vecCosine(col("a"), col("a"))).collect()
    assert(withNullElem.head.isNullAt(0))
  }

  test("mixed float/double and integer arrays coerce like the zip_with form did") {
    val mixed = Seq((Array(3.0f, 4.0f), Array(3.0, 4.0))).toDF("a", "b")
    assert(mixed.select(GraftFunctions.vecCosine(col("a"), col("b")))
      .collect().head.getDouble(0) == 1.0)
    val ints = Seq((Array(1, 0), Array(0, 1))).toDF("a", "b")
    assert(ints.select(GraftFunctions.vecCosine(col("a"), col("b")))
      .collect().head.getDouble(0) == 0.0)
  }

  test("rejects non-numeric arrays at analysis") {
    val df = Seq((Array("x"), Array("y"))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(GraftFunctions.vecCosine(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("vec_cosine") || ex.getMessage.contains("DATATYPE"))
  }

  test("registers for SQL via GraftFunctions.register") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      """SELECT vec_cosine(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
        |                  array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)))""".stripMargin)
      .collect().head.getDouble(0)
    assert(v == 1.0)
  }

  test("Similarity.cosine (now native) still matches DuckDB-style exact cosine") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)))
      .toDF("a", "b")
    val v = df.select(Similarity.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(math.abs(v - 1.0) < 1e-15)
  }
}
