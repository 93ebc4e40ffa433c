package graft

import org.apache.spark.sql.functions._
import graft.sim.Pca

/** Exactness pins for the PCA spectrum (SURVEY §2 row 130): the
  * registered query is rows-only (eigendecompositions have no ANSI
  * form), so the algebra is pinned here — a closed-form 2-D fixture,
  * orthonormality, variance-along-component ≡ eigenvalue, ratio
  * bookkeeping, and the refusal ladder. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** 3×3 grid of a·u + b·v with orthonormal u=(0.6,0.8), v=(−0.8,0.6),
    * a ∈ {−2,0,2}, b ∈ {−1,0,1}: zero mean, zero cross-moment, so the
    * covariance is exactly var(a)·uuᵀ + var(b)·vvᵀ with var(a)=8/3,
    * var(b)=2/3 — eigenpairs known in closed form. */
  private def grid = {
    val u = (0.6f, 0.8f); val v = (-0.8f, 0.6f)
    val pts = for (a <- Seq(-2f, 0f, 2f); b <- Seq(-1f, 0f, 1f))
      yield Array(a * u._1 + b * v._1, a * u._2 + b * v._2)
    pts.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "vec")
  }

  test("closed-form 2-D fixture: eigenvalues, ratios, sign convention") {
    val rows = Pca.spectrum(grid, "vec").orderBy("component").collect()
    assert(rows.length == 2)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows(0).getAs[Double]("eigenvalue") == r6(8.0 / 3.0))
    assert(rows(1).getAs[Double]("eigenvalue") == r6(2.0 / 3.0))
    assert(rows(0).getAs[Double]("explained_ratio") == 0.8)
    assert(rows(1).getAs[Double]("explained_ratio") == 0.2)
    assert(rows(1).getAs[Double]("cum_ratio") == 1.0)
    // component 0 is ±u=(0.6,0.8): largest |loading| is dim 1, sign fixed +
    assert(rows(0).getAs[Int]("top_dim") == 1)
    assert(rows(0).getAs[Double]("top_loading") == 0.8)
    // component 1 is ±v: sign convention flips (−0.8,0.6) to (0.8,−0.6)
    assert(rows(1).getAs[Int]("top_dim") == 0)
    assert(rows(1).getAs[Double]("top_loading") == 0.8)
  }

  test("fit on the embedding corpus: orthonormal basis, ordered spectrum") {
    val m = Pca.fit(Tables.embeddings(spark, sfDir), "embedding")
    val d = m.dim
    assert(d == 64 && m.eigenvalues.length == d && m.eigenvectors.length == d)
    // descending eigenvalues
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    // orthonormality: VᵀV = I within Jacobi tolerance
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => m.eigenvectors(i)(k) * m.eigenvectors(j)(k)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"V[$i]·V[$j] = $dot")
    }
  }

  test("variance along each top component equals its eigenvalue") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = Pca.fit(emb, "embedding")
    val k = 4
    val pc = Pca.project(emb, "vec_id", "embedding", m, k)
    val agg = pc.select((0 until k).flatMap(i => Seq(
      sum(col("pc")(i)).as(s"s$i"),
      sum(col("pc")(i) * col("pc")(i)).as(s"q$i"))) :+
      count(lit(1)).cast("double").as("n"): _*).head()
    val n = agg.getAs[Double]("n")
    for (i <- 0 until k) {
      val mean = agg.getAs[Double](s"s$i") / n
      val varI = agg.getAs[Double](s"q$i") / n - mean * mean
      assert(math.abs(varI - m.eigenvalues(i)) < 1e-6 * math.max(1.0, m.eigenvalues(i)),
        s"var(pc$i)=$varI vs λ=${m.eigenvalues(i)}")
    }
  }

  test("whitened components have unit variance; non-positive eigenvalues refuse") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = Pca.fit(emb, "embedding")
    val k = 3
    val wh = Pca.whitenFlat(emb, "vec_id", "embedding", m, k)
    val agg = wh.select((0 until k).flatMap(i => Seq(
      sum(col(s"pc_$i")).as(s"s$i"),
      sum(col(s"pc_$i") * col(s"pc_$i")).as(s"q$i"))) :+
      count(lit(1)).cast("double").as("n"): _*).head()
    val n = agg.getAs[Double]("n")
    for (i <- 0 until k) {
      val mean = agg.getAs[Double](s"s$i") / n
      val varI = agg.getAs[Double](s"q$i") / n - mean * mean
      assert(math.abs(varI - 1.0) < 1e-3, s"var(whitened pc$i)=$varI != 1")
    }
    // a zero eigenvalue in range refuses (the Infinity-row alternative)
    val degenerate = Pca.Model(m.mean, m.eigenvalues.updated(1, 0.0),
      m.eigenvectors)
    val ex = intercept[IllegalArgumentException] {
      Pca.whitenFlat(emb, "vec_id", "embedding", degenerate, k = 2)
    }
    assert(ex.getMessage.contains("non-positive"))
    // but projecting ABOVE the bad component is still fine
    assert(Pca.whitenFlat(emb, "vec_id", "embedding", degenerate, k = 1)
      .columns.contains("pc_0"))
  }

  test("spectrum ratios are a partition of total variance") {
    val rows = Pca.spectrum(Tables.embeddings(spark, sfDir), "embedding")
      .orderBy("component").collect()
    val ratios = rows.map(_.getAs[Double]("explained_ratio"))
    assert(math.abs(ratios.sum - 1.0) < 1e-3) // 6-dp rounding per row
    assert(rows.last.getAs[Double]("cum_ratio") == 1.0)
    assert(ratios.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("fit is bit-identical under different partition layouts (r15)") {
    val e = Tables.embeddings(spark, sfDir).select("embedding")
    def model(parts: Int) = Pca.fit(e.repartition(parts), "embedding")
    val a = model(1)
    val b = model(7)
    def bits(xs: Array[Double]) = xs.map(java.lang.Double.doubleToLongBits).toSeq
    assert(bits(a.mean) == bits(b.mean), "mean moved with the layout")
    assert(bits(a.eigenvalues) == bits(b.eigenvalues),
      "eigenvalues moved with the layout")
    assert(a.eigenvectors.map(bits).toSeq == b.eigenvectors.map(bits).toSeq,
      "eigenvectors moved with the layout")
  }

  test("misuse is refused: empty input, tiny dim, bad projection k, dim mix") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    assertThrows[IllegalArgumentException](Pca.fit(empty, "vec"))
    val d1 = Seq((1L, Array(1f)), (2L, Array(2f))).toDF("id", "vec")
    assertThrows[IllegalArgumentException](Pca.fit(d1, "vec"))
    val m = Pca.fit(grid, "vec")
    assertThrows[IllegalArgumentException](
      Pca.project(grid, "id", "vec", m, 0))
    assertThrows[IllegalArgumentException](
      Pca.project(grid, "id", "vec", m, 3))
    val mixed = Seq((1L, Array(1f, 2f)), (2L, Array(1f, 2f, 3f))).toDF("id", "vec")
    assertThrows[Exception](Pca.fit(mixed, "vec")) // dim mismatch inside the pass
  }
}
