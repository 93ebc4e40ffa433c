package graft

import graft.sim.Quantize

/** Pins for the int8 quantization audit (SURVEY §2 row 129): hand-coded
  * code books, the constant-vector guard, and the half-step error bound
  * on the real corpus (the property the oracle's hash can't state). */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("endpoints quantize exactly: [0,1] has zero reconstruction error") {
    val df = Seq((1L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Audit(df, "vec_id", "embedding").head()
    assert(r.getAs[Long]("n_dims") == 2)
    assert(r.getAs[Double]("vmin") == 0.0)
    assert(r.getAs[Double]("scale") == 1.0 / 255.0)
    assert(r.getAs[Double]("max_abs_err") == 0.0)
    assert(r.getAs[Double]("mse") == 0.0)
  }

  test("constant vectors get unit scale and zero error") {
    val df = Seq((1L, Array(2.5f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Audit(df, "vec_id", "embedding").head()
    assert(r.getAs[Double]("scale") == 1.0)
    assert(r.getAs[Double]("max_abs_err") == 0.0 && r.getAs[Double]("mse") == 0.0)
  }

  test("interior points reconstruct within half a code step") {
    val df = Seq((1L, Array(0f, 0.1f, 0.77f, 1f))).toDF("vec_id", "embedding")
    val r = Quantize.int8Audit(df, "vec_id", "embedding").head()
    val scale = r.getAs[Double]("scale")
    assert(r.getAs[Double]("max_abs_err") > 0.0)
    assert(r.getAs[Double]("max_abs_err") <= scale / 2 + 1e-7)
  }

  test("corpus-wide: every vector within the half-step bound, mse ≤ max²") {
    val out = Quantize.int8Audit(Tables.embeddings(spark, sfDir),
      "vec_id", "embedding").collect()
    assert(out.length == 500)
    out.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val mx = r.getAs[Double]("max_abs_err")
      assert(mx <= scale / 2 + 1e-7, s"vec ${r.getLong(0)}: $mx > $scale/2")
      assert(r.getAs[Double]("mse") <= mx * mx + 1e-10)
      assert(r.getAs[Long]("n_dims") == 64)
    }
  }
}
