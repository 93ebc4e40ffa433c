package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval fusion — reciprocal rank fusion (Cormack, Clarke &
  * Büttcher, SIGIR 2009): combine any number of rankings of the same
  * corpus by `score(d) = Σ_r 1 / (c + rank_r(d))`, the standard way to
  * marry lexical ([[graft.text.Bm25]]) and embedding ([[Similarity]],
  * [[IvfPq]]) retrieval without calibrating their incomparable scores —
  * RRF only reads RANKS, so a BM25 log-scale score and a cosine fuse
  * cleanly. `c` (default 60, the paper's value) damps the head so one
  * list's rank-1 cannot drown the other list entirely.
  *
  * Spark shape: each input ranking is already a top-k frame
  * (queries × k rows — dimension-sized by the ANN batch contract), so
  * the fusion is a full-outer join chain over tiny frames plus one
  * per-query window; cost lives in the upstream retrievers. A document
  * absent from one list contributes 0 from it (the paper's convention),
  * absent from all lists it simply doesn't appear.
  *
  * Determinism: each contribution is one IEEE division, summed in the
  * fixed input order, so scores are bit-identical across engines; final
  * order ties break on the document id. */
object Hybrid {

  /** Fuse rankings into (queryCol, rank, idCol, rrf_score). Every input
    * must expose (queryCol, idCol, rankCol) with 1-based ranks. */
  def rrf(rankings: Seq[DataFrame], queryCol: String, idCol: String,
          rankCol: String, k: Int = 10, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrf needs at least one ranking")
    require(k >= 1, s"k=$k must be >= 1")
    require(c >= 0, s"c=$c must be >= 0")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(queryCol), col(idCol),
        (lit(1.0) / (lit(c.toDouble) + col(rankCol))).as(s"_gf_r$i"))
    }
    val joined = tagged.reduce((a, b) =>
      a.join(b, Seq(queryCol, idCol), "full_outer"))
    val score = rankings.indices
      .map(i => coalesce(col(s"_gf_r$i"), lit(0.0)))
      .reduce(_ + _)
    val w = Window.partitionBy(queryCol)
      .orderBy(col("rrf_score").desc, col(idCol))
    joined
      .withColumn("rrf_score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryCol), col("rank"), col(idCol),
        graft.Num.dround(col("rrf_score"), 6).as("rrf_score"))
  }
}
