package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.JaroWinkler.jaroWinkler

/** Blocked record linkage (entity resolution): match each dirty record to
  * its best master candidate under a string-similarity score, with a
  * BLOCKING key bounding the candidate set — the Fellegi-Sunter /
  * dedupe-style shape (public literature), scaled the Spark way.
  * Extends [[graft.normalize.Normalizer.fuzzyCorrect]] (which scores
  * against ONE broadcast master list) to master tables of any size:
  * blocking turns the all-pairs score into an equi-join.
  *
  * Scale shape: candidates come from an EQUI-join on the blocking key —
  * never a cross join — so the pair count is Σ_block |L_b|·|R_b|, bounded
  * by the block design; both sides should be pre-collapsed to distinct
  * values (the fuzzyCorrect discipline — score values, not rows). The
  * winner per left record is ONE map-side-combined `min_by` aggregate
  * (the keep-best-component precedent: no window, no single-reducer
  * pile-up on a hot left key). Scoring is the codegen'd native
  * [[graft.functions.JaroWinklerExpr]] — no UDF in the pair loop.
  */
object RecordLinkage {

  /** Best master match per left record: (leftId, match_id, score 6-dp,
    * n_candidates). Candidates below `minScore` are dropped BEFORE the
    * argmax; left records with no surviving candidate are absent (inner
    * semantics — compose a left-anti join for the unmatched report).
    * Ties break on the smallest right id, so the result is a total
    * function of the inputs. */
  def bestMatch(left: DataFrame, leftId: String, leftText: String,
                right: DataFrame, rightId: String, rightText: String,
                blockKey: Column => Column, minScore: Double): DataFrame = {
    require(minScore >= 0 && minScore <= 1,
      s"minScore must be in [0,1], got $minScore (Jaro-Winkler is 0-1)")
    val l = left.select(col(leftId).as("_gf_lid"), col(leftText).as("_gf_lt"),
      blockKey(col(leftText)).as("_gf_blk"))
    val r = right.select(col(rightId).as("_gf_rid"), col(rightText).as("_gf_rt"),
      blockKey(col(rightText)).as("_gf_blk"))
    val scored = l.join(r, "_gf_blk")
      .withColumn("_gf_s", jaroWinkler(col("_gf_lt"), col("_gf_rt")))
      .filter(col("_gf_s") >= minScore)
    scored.groupBy(col("_gf_lid").as(leftId))
      .agg(
        min_by(struct(col("_gf_rid"), col("_gf_s")),
          struct(negate(col("_gf_s")), col("_gf_rid"))).as("_gf_best"),
        count(lit(1)).as("n_candidates"))
      .select(col(leftId),
        col("_gf_best._gf_rid").as("match_id"),
        graft.Num.dround(col("_gf_best._gf_s"), 6).as("score"),
        col("n_candidates"))
  }
}
