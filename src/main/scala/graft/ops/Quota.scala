package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group quota capping — "keep at most `n` documents per source/domain",
  * the standard anti-domination rule in corpus curation (a single crawl
  * domain must not swamp the mixture).
  *
  * Selection is deterministic: rows are ranked inside each group by the
  * same Knuth hash as [[Sampling]] (tie-broken by the key itself), so the
  * surviving set is reproducible across runs, retries, and engines — not
  * whatever `limit` happens to scan first.
  *
  * Scale shape: one hash-partition shuffle on the group column + a
  * sort-based window (spills, never collects a group in memory). When a
  * single group's row count is astronomically larger than `n` (the 100 TB
  * skew case: one domain = billions of rows on one reducer), pre-thin with
  * `Sampling.hashSample(df, keyCol, frac)` at a few×`n`/count first — the
  * window then ranks the thinned set; same policy, bounded reducer.
  */
object Quota {

  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  n: Int, seed: Long = 0L): DataFrame = {
    require(n >= 1, s"quota must be >= 1, got $n")
    Sampling.requireIntegralKey(df, keyCol)
    val w = Window.partitionBy(groupCol)
      .orderBy(Sampling.bucket(col(keyCol), seed, Sampling.QuotaPrime), col(keyCol))
    df.withColumn("_gf_rn", row_number().over(w))
      .filter(col("_gf_rn") <= n)
      .drop("_gf_rn")
  }

  /** SQL mirror of [[capPerGroup]]'s predicate for a DuckDB oracle (as a
    * QUALIFY clause body). */
  def sqlQualify(groupCol: String, keyCol: String, n: Int, seed: Long = 0L): String =
    s"row_number() OVER (PARTITION BY $groupCol ORDER BY " +
      s"${Sampling.sqlBucket(keyCol, seed, Sampling.QuotaPrime)}, $keyCol) <= $n"
}
