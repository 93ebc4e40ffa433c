package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Maximal Marginal Relevance selection (Carbonell & Goldstein 1998 —
  * public): greedily pick k items maximizing
  * λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) — relevance to a query vector
  * traded against redundancy with what's already selected. λ=1
  * degenerates to plain top-k by cosine; λ=0 to similarity-avoiding
  * (k-center-flavored) picking. The corpus-scale use is diverse
  * exemplar/eval-set selection around a topic vector, not per-query
  * serving (there MMR re-ranks an ANN shortlist client-side).
  *
  * Scale shape: the [[KCenter]] discipline — k bounded driver rounds,
  * each ONE map-side-combined `max_by` argmax over the corpus with the
  * selected vectors riding as broadcast literals into the codegen'd
  * [[graft.functions.VecCosine]] kernel; nothing corpus-sized ever
  * moves. Oracle parity: scores are identical IEEE trees (the
  * (1 − λ) factor is COMPUTED as `1 - λ` on both engines, never a
  * pre-evaluated literal — 1−0.7 is not the double 0.3), ties break on
  * min id, and the emitted frame is integers only (round, id). */
object Mmr {

  def select(df: DataFrame, idCol: String, vecCol: String,
             queryVec: Seq[Double], k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1], got $lambda")
    require(queryVec.nonEmpty && queryVec.exists(_ != 0.0),
      "queryVec must be non-empty with a non-zero norm (cosine undefined)")
    val spark = df.sparkSession
    val v = col(vecCol)
    val norm2 = aggregate(transform(v, x => x.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x * x)
    val clean = df
      .filter(v.isNotNull && size(v) > 0 && !exists(v, x => x.isNull))
      .filter(norm2 > 0)
      .select(col(idCol).cast("long").as("_gf_id"), v.as("_gf_v"))
    val rel = graft.functions.GraftFunctions.vecCosine(
      col("_gf_v"), typedlit(queryVec.toArray))

    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var selected = Vector.empty[Seq[Double]]
    var t = 0
    while (t < k) {
      val score =
        if (selected.isEmpty) rel
        else {
          val sims = selected.map(s =>
            graft.functions.GraftFunctions.vecCosine(col("_gf_v"),
              typedlit(s.toArray)))
          val penalty = if (sims.size == 1) sims.head else greatest(sims: _*)
          lit(lambda) * rel - (lit(1.0) - lit(lambda)) * penalty
        }
      val picked = picks.map(_._2).toSet
      val candidates =
        if (picked.isEmpty) clean else clean.filter(!col("_gf_id").isInCollection(picked))
      val row = candidates
        .select(struct(col("_gf_id"), col("_gf_v")).as("_gf_s"),
          struct(score.as("_gf_sc"), (-col("_gf_id")).as("_gf_nid")).as("_gf_o"))
        .agg(max_by(col("_gf_s"), col("_gf_o")).as("_gf_w"))
        .collect()(0)
      if (row.isNullAt(0))
        throw new IllegalArgumentException(
          s"mmr: corpus exhausted after ${picks.size} picks — asked for $k " +
            s"but only ${picks.size} usable vectors exist")
      val s = row.getStruct(0)
      picks += ((t + 1, s.getLong(0)))
      selected = selected :+
        s.getSeq[Any](1).map(x => x.asInstanceOf[Number].doubleValue())
      t += 1
    }
    import spark.implicits._
    picks.toSeq.toDF("round", "vec_id")
  }
}
