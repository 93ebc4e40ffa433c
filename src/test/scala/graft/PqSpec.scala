package graft

import graft.functions.GraftFunctions
import graft.sim.{Pq, Similarity}
import org.apache.spark.sql.functions._

/** Pins [[graft.sim.Pq]] product quantization and its kernels
  * ([[graft.functions.PackBytes]], [[graft.functions.PqAdcSum]],
  * [[graft.functions.VecL2Sq]]): kernel arithmetic, fail-loudly contracts,
  * ADC exactness on codebook-resident vectors, deterministic recall
  * against brute force, and index persistence. */
class PqSpec extends SparkSpec {

  private lazy val sqlc = spark
  import sqlc.implicits._

  test("PackBytes packs 0..255 into bytes; out-of-range raises") {
    val df = Seq(Tuple1(Seq(0, 1, 127, 128, 255))).toDF("codes")
    val bytes = df.select(GraftFunctions.packBytes(col("codes")))
      .collect()(0).getAs[Array[Byte]](0)
    assert(bytes.toSeq == Seq[Byte](0, 1, 127, -128, -1)) // unsigned packing
    val bad = Seq(Tuple1(Seq(0, 256))).toDF("codes")
    val e = intercept[Exception] {
      bad.select(GraftFunctions.packBytes(col("codes"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("PqAdcSum: subspace-major LUT reads; mismatches raise") {
    // m=2 subspaces, ks=3: code (2, 0) must read lut[0*3+2] + lut[1*3+0]
    val lut = Seq(10.0, 20.0, 30.0, 1.0, 2.0, 3.0)
    val df = Seq((Seq(2, 0), lut)).toDF("codes", "lut")
      .select(GraftFunctions.packBytes(col("codes")).as("code"), col("lut"))
    val s = df.select(GraftFunctions.pqAdcSum(col("code"), col("lut"), 3))
      .collect()(0).getDouble(0)
    assert(s == 30.0 + 1.0)
    // LUT length not m×ks → raise (code from another codebook)
    intercept[Exception] {
      df.select(GraftFunctions.pqAdcSum(col("code"), col("lut"), 4)).collect()
    }
    // code byte >= ks → raise
    val big = Seq((Seq(3, 0), lut)).toDF("codes", "lut")
      .select(GraftFunctions.packBytes(col("codes")).as("code"), col("lut"))
    intercept[Exception] {
      big.select(GraftFunctions.pqAdcSum(col("code"), col("lut"), 3)).collect()
    }
  }

  test("VecL2Sq matches a plain-Scala reference; length mismatch is NULL") {
    val a = Seq(1.0f, -2.0f, 3.5f); val b = Seq(0.5f, 2.0f, -1.0f)
    val expected = a.zip(b).map { case (x, y) =>
      (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(GraftFunctions.vecL2Sq(col("a"), col("b")))
      .collect()(0).getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
    val mis = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    assert(mis.select(GraftFunctions.vecL2Sq(col("a"), col("b")))
      .collect()(0).isNullAt(0))
  }

  /** Handed (untrained) codebooks whose entries ARE the corpus vectors'
    * subvector slices: quantization residual is zero, so the ADC estimate
    * must equal the exact cosine — the correctness core of the ADC
    * algebra (lut order, packing order, the 1 - d²/2 identity). */
  test("ADC is exact for codebook-resident vectors") {
    def unit(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val v0 = unit(Seq(1.0, 2.0, -1.0, 0.5))
    val v1 = unit(Seq(-0.5, 1.0, 3.0, 2.0))
    val codebooks = Seq(
      (0, 0, v0.slice(0, 2)), (0, 1, v1.slice(0, 2)),
      (1, 0, v0.slice(2, 4)), (1, 1, v1.slice(2, 4)))
      .toDF("_gf_m", "_gf_c", "_gf_cbv")
    val corpus = Seq((0L, v0.map(_.toFloat)), (1L, v1.map(_.toFloat)))
      .toDF("vec_id", "embedding")
    val codes = Pq.encode(corpus, "vec_id", "embedding", codebooks, m = 2, ds = 2)
    val index = Pq.PqIndex(codebooks, codes,
      Pq.PqMeta(4, 2, 2, 0, 0L, "cosine-l2adc"))
    val queries = Seq((100L, Seq(2.0f, -1.0f, 0.5f, 1.0f)),
      (101L, v0.map(_.toFloat))).toDF("vec_id", "embedding")
    val adc = Pq.topK(index, queries, "vec_id", "embedding", k = 2)
      .orderBy("query_id", "rank").collect()
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 2)
      .orderBy("query_id", "rank").collect()
    assert(adc.length == 4 && exact.length == 4)
    for ((a, e) <- adc.zip(exact)) {
      assert(a.getAs[Long]("neighbor_id") == e.getAs[Long]("neighbor_id"))
      assert(math.abs(a.getAs[Double]("adc_cosine") -
        e.getAs[Double]("cosine")) <= 1e-4) // both dround'd independently
    }
  }

  test("codes are exactly m bytes — the 32x memory claim is real") {
    val e = Tables.embeddings(spark, sfDir)
    val index = Pq.train(e, "vec_id", "embedding", m = 8, ks = 16, iters = 1)
    val lens = index.codes.select(length(col("_gf_code"))).distinct().collect()
    assert(lens.map(_.getInt(0)).toSeq == Seq(8))
  }

  test("trained recall@10 vs brute force is deterministic and useful") {
    val e = Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") < 5)
    val index = Pq.train(e, "vec_id", "embedding", m = 16, ks = 16, iters = 2)
    val adc = Pq.topK(index, queries, "vec_id", "embedding", k = 10)
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10)
    val recall = Similarity.recallAt(exact, Seq("pq" -> adc))
      .agg(avg(col("recall"))).collect()(0).getDouble(0)
    // deterministic (hash seeds, no RNG): measured 0.54 on this fixture —
    // near-random 64-dim embeddings are PQ's adversarial case (recall
    // scales with m and ks exactly as the paper predicts: m=8/ks=16
    // → 0.30, m=32/ks=64 → 0.82 on the same data). The floor catches a
    // broken quantizer (random codes would land near k/n = 0.1).
    assert(recall >= 0.5, s"PQ recall@10 collapsed: $recall")
  }

  test("dim mismatch raises at plan time; persistence round-trips") {
    val e = Tables.embeddings(spark, sfDir)
    val index = Pq.train(e, "vec_id", "embedding", m = 8, ks = 16, iters = 1)
    val badQ = e.select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding"))
    val ex = intercept[IllegalArgumentException] {
      Pq.topK(index, badQ, "vec_id", "embedding", k = 5)
    }
    assert(ex.getMessage.contains("dim"))

    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-spec").toString
    Pq.writeIndex(index, tmp)
    val re = Pq.readIndex(spark, tmp)
    assert(re.meta == index.meta)
    val q = e.filter(col("vec_id") < 3)
    val a = Pq.topK(index, q, "vec_id", "embedding", k = 5)
      .collect().map(_.toSeq).toSeq
    val b = Pq.topK(re, q, "vec_id", "embedding", k = 5)
      .collect().map(_.toSeq).toSeq
    assert(a == b) // the round trip must not move results

    // manifest negatives: missing and metric-mismatch
    intercept[IllegalArgumentException] {
      Pq.readIndex(spark, tmp + "-nope")
    }
    val mp = java.nio.file.Paths.get(tmp, "manifest.json")
    // hand-editing the manifest outside the Hadoop FS leaves a stale
    // .crc sidecar behind — remove it so the read sees the new bytes
    def rewrite(json: String): Unit = {
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(tmp, ".manifest.json.crc"))
      java.nio.file.Files.writeString(mp, json): Unit
    }
    rewrite("""{"format": "graft-pq-v1", "dim": 64, "m": 8, "ks": 16,
        | "iters": 1, "seed": 42, "metric": "l2"}""".stripMargin)
    val em = intercept[IllegalArgumentException] { Pq.readIndex(spark, tmp) }
    assert(em.getMessage.contains("metric"))
    // corrupt manifest pinned to wrong dim vs data
    rewrite("""{"format": "graft-pq-v1", "dim": 32, "m": 8, "ks": 16,
        | "iters": 1, "seed": 42, "metric": "cosine-l2adc"}""".stripMargin)
    val ed = intercept[IllegalArgumentException] { Pq.readIndex(spark, tmp) }
    assert(ed.getMessage.contains("inconsistent"))
  }

  test("appendToIndex encodes a new batch against frozen codebooks") {
    val e = Tables.embeddings(spark, sfDir)
    val old = e.filter(col("vec_id") % 2 === 0)
    val fresh = e.filter(col("vec_id") % 2 === 1)
    val index = Pq.train(old, "vec_id", "embedding", m = 8, ks = 16, iters = 1)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    Pq.writeIndex(index, tmp)

    val appended = Pq.appendToIndex(spark, tmp, fresh, "vec_id", "embedding")
    assert(appended == fresh.count())
    val re = Pq.readIndex(spark, tmp)
    assert(re.codes.count() == e.count())
    // appended codes are EXACTLY what encoding against the frozen
    // codebooks yields — byte-for-byte
    val expect = Pq.encode(fresh, "vec_id", "embedding", index.codebooks,
        8, index.meta.dim / 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val got = re.codes.join(fresh.select(col("vec_id").as("_gf_id")), Seq("_gf_id"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(got == expect)
    // a probe through the re-opened index can now rank appended rows:
    // an appended query's own code scores with ADC distance ~0 to itself
    val q = fresh.filter(col("vec_id") < 10)
    assert(q.count() > 0)
    val top = Pq.topK(re, q, "vec_id", "embedding", k = 1)
      .collect()
    assert(top.nonEmpty)
    // refusals: id collision and wrong dim, both before writing
    val ex = intercept[IllegalArgumentException] {
      Pq.appendToIndex(spark, tmp, fresh, "vec_id", "embedding")
    }
    assert(ex.getMessage.contains("re-uses ids"))
    assert(Pq.readIndex(spark, tmp).codes.count() == e.count())
    val bad = fresh.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    val ex2 = intercept[IllegalArgumentException] {
      Pq.appendToIndex(spark, tmp, bad, "vec_id", "embedding")
    }
    assert(ex2.getMessage.contains("dim"))
    index.release()
  }
}
