package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Exact n-gram Jaccard similarity (SURVEY §2.3 row 48). Candidates come
  * from the MinHash LSH buckets; only candidate pairs pay the exact
  * set-intersection cost, and the (potentially large) shingle arrays are
  * joined back BY ID after the bucket join — they never ride the bucket
  * shuffle.
  */
object NgramJaccard {

  /** |A∩B| / |A∪B| over shingle set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Pairs with exact n-gram Jaccard >= threshold (idA < idB), candidates
    * via MinHash bands. `bandThreshold` filters candidates cheaply on the
    * estimated Jaccard before the exact rerank. */
  def pairs(df: DataFrame, textCol: String, idCol: String,
            n: Int = 3, threshold: Double = 0.5,
            k: Int = 64, bands: Int = 16): DataFrame =
    pairsOverCandidates(df,
      MinHash.nearDuplicatePairs(df, textCol, idCol, n, k, bands,
        threshold = math.max(0.0, threshold - 0.2)).select("id_a", "id_b"),
      textCol, idCol, n, threshold)

  /** [[pairs]] body over an EXTERNAL candidate frame `(id_a, id_b)` —
    * callers that already hold a signature table (the dedup grader runs
    * the MinHash detector next to this one) generate candidates from it
    * once instead of re-shingling a second signature pass (r14). */
  def pairsOverCandidates(df: DataFrame, candidates: DataFrame,
                          textCol: String, idCol: String,
                          n: Int, threshold: Double): DataFrame =
    pairsOverCandidatesShingles(
      df.select(col(idCol).as("_gf_sid"),
        array_distinct(MinHash.shingles(col(textCol), n)).as("_gf_sh")),
      candidates, threshold)

  /** [[pairsOverCandidates]] over an already-tokenized array column. */
  def pairsOverCandidatesTokens(df: DataFrame, candidates: DataFrame,
                                toksCol: String, idCol: String,
                                n: Int, threshold: Double): DataFrame =
    pairsOverCandidatesShingles(
      df.select(col(idCol).as("_gf_sid"),
        array_distinct(MinHash.shinglesOfTokens(col(toksCol), n)).as("_gf_sh")),
      candidates, threshold)

  private def pairsOverCandidatesShingles(sh: DataFrame,
                                          candidates: DataFrame,
                                          threshold: Double): DataFrame = {
    candidates
      .join(sh.select(col("_gf_sid").as("id_a"), col("_gf_sh").as("_gf_sh_a")), Seq("id_a"))
      .join(sh.select(col("_gf_sid").as("id_b"), col("_gf_sh").as("_gf_sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.Num.dround(jaccard(col("_gf_sh_a"), col("_gf_sh_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
