package graft

import org.apache.spark.sql.functions._

import graft.sim.PqHanded

/** Pins for the handed-codebook PQ lane (SURVEY §2 rows 91/92 grown):
  * codebook points encode to themselves, zero-quantization-error corpora
  * make ADC equal exact L2, and candidate scoping composes as pure
  * pruning. Config m=2/ks=4/ds=8 keeps every subspace codebook's four
  * Walsh patterns distinct (over 8 dims, patterns m and m+8 coincide —
  * the registry's m=8/ds=8 windows stay below that). */
class PqHandedSpec extends SparkSpec {
  import spark.implicits._

  private val (m, ks, ds) = (2, 4, 8)
  private val cb = PqHanded.codebook(m, ks, ds)

  /** The exact vector for a (code₀, code₁) codebook combination. */
  private def vecFor(cs: Seq[Int]): Seq[Double] =
    cs.zipWithIndex.flatMap { case (c, mi) =>
      cb.filter(r => r._1 == mi && r._2 == c).sortBy(_._3).map(_._4)
    }

  test("codebook points encode to themselves") {
    val df = Seq((1L, vecFor(Seq(0, 3))), (2L, vecFor(Seq(2, 1))))
      .toDF("vec_id", "embedding")
    val codes = PqHanded.encode(df, "vec_id", "embedding", m, ks, ds)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getInt(2))).toSet
    assert(codes == Set((1L, 0, 0), (1L, 1, 3), (2L, 0, 2), (2L, 1, 1)))
  }

  test("zero-quantization-error corpus: ADC equals exact squared L2") {
    // every vector IS a codebook combination, so the ADC estimate is the
    // exact distance — sums of 0.0625 per differing coordinate
    val combos = for (a <- 0 until ks; b <- 0 until ks) yield Seq(a, b)
    val corpus = combos.zipWithIndex
      .map { case (cs, i) => (i.toLong + 10, vecFor(cs)) }
      .toDF("vec_id", "embedding")
    val query = Seq((1L, vecFor(Seq(0, 0)))).toDF("vec_id", "embedding")
    val got = PqHanded.topK(corpus, query, "vec_id", "embedding",
        m, ks, ds, k = combos.size)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    val qv = vecFor(Seq(0, 0))
    val exact = combos.zipWithIndex.map { case (cs, i) =>
      (i.toLong + 10,
        vecFor(cs).zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.toMap
    exact.foreach { case (id, d) =>
      assert(math.abs(got(id) - d) < 1e-9, s"id $id: adc ${got(id)} vs exact $d")
    }
  }

  test("candidate scoping is pure pruning; refusals") {
    val combos = for (a <- 0 until ks; b <- 0 until ks) yield Seq(a, b)
    val corpus = combos.zipWithIndex
      .map { case (cs, i) => (i.toLong + 10, vecFor(cs)) }
      .toDF("vec_id", "embedding")
    val query = Seq((1L, vecFor(Seq(1, 2)))).toDF("vec_id", "embedding")
    val full = PqHanded.topK(corpus, query, "vec_id", "embedding",
        m, ks, ds, k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    // all-pairs candidates reproduce the unscoped scan exactly
    val allCand = corpus.select(lit(1L).as("query_id"),
      col("vec_id").as("neighbor_id"))
    val scopedAll = PqHanded.topK(corpus, query, "vec_id", "embedding",
        m, ks, ds, k = 5, candidates = Some(allCand))
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3))).toSeq
    assert(full == scopedAll)
    // a restricted candidate set returns exactly its own members, ranked
    val some = corpus.filter(col("vec_id") % 3 === 0)
      .select(lit(1L).as("query_id"), col("vec_id").as("neighbor_id"))
    val scoped = PqHanded.topK(corpus, query, "vec_id", "embedding",
        m, ks, ds, k = 100, candidates = Some(some))
      .collect().map(_.getLong(1)).toSet
    assert(scoped == (10 to 25).map(_.toLong).filter(_ % 3 == 0).toSet)
    intercept[IllegalArgumentException](
      PqHanded.topK(corpus, query, "vec_id", "embedding", m, ks, ds, k = 0))
  }
}
