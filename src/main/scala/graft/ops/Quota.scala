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
  * skew case: one domain = billions of rows on one reducer), pass
  * `preThin = true`: a first window over `(group, salt-bucket)` keeps each
  * sub-bucket's top `n`, splitting the dominant group across
  * `preThinBuckets` reducers, and only the ≤ `preThinBuckets × n`
  * per-group survivors reach the final per-group window. The result is
  * IDENTICAL to the direct path by the pigeonhole argument: any row in a
  * group's global top `n` under the (hash, key) order is necessarily in
  * the top `n` of its own sub-bucket, so phase 1 never discards a winner.
  */
object Quota {

  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                  n: Int, seed: Long = 0L, preThin: Boolean = false,
                  preThinBuckets: Int = 64): DataFrame = {
    require(n >= 1, s"quota must be >= 1, got $n")
    require(preThinBuckets >= 2,
      s"preThinBuckets must be >= 2, got $preThinBuckets")
    Sampling.requireIntegralKey(df, keyCol)
    val rank = Sampling.bucket(col(keyCol), seed, Sampling.QuotaPrime)
    val base =
      if (!preThin) df
      else {
        // Salt by a hash UNRELATED to the rank hash (xxhash64 vs Knuth
        // fold) so the sub-buckets split the group evenly; correctness
        // does not depend on the independence, only the reducer bound
        // does. The salt is deterministic in the key — retries and
        // engines agree on the sub-bucket assignment.
        val salt = pmod(xxhash64(col(keyCol)), lit(preThinBuckets.toLong))
        val w1 = Window.partitionBy(col(groupCol), salt)
          .orderBy(rank, col(keyCol))
        df.withColumn("_gf_prn", row_number().over(w1))
          .filter(col("_gf_prn") <= n)
          .drop("_gf_prn")
      }
    val w = Window.partitionBy(groupCol).orderBy(rank, col(keyCol))
    base.withColumn("_gf_rn", row_number().over(w))
      .filter(col("_gf_rn") <= n)
      .drop("_gf_rn")
  }

  /** Dominant-group row share above which [[capPerGroupAuto]] takes the
    * pre-thin route. */
  val AutoSkewShare = 0.3

  /** [[capPerGroup]] with the skew route picked FOR you. One cheap
    * pre-check job — a keyed count where only (group, count) pairs
    * shuffle (map-side combined), folded to (max, total) — decides
    * whether the dominant group is big enough for pre-thinning to pay:
    * it must hold at least [[AutoSkewShare]] of all rows AND exceed
    * 2·buckets·n rows. Below either bar the direct single-window plan
    * wins — pre-thinning adds a full extra window pass over every row,
    * which only amortizes when one reducer would otherwise own a
    * monster group. Callers that already know their skew skip the
    * pre-check by calling [[capPerGroup]] with `preThin` set explicitly
    * (the documented override). */
  def capPerGroupAuto(df: DataFrame, groupCol: String, keyCol: String,
                      n: Int, seed: Long = 0L,
                      preThinBuckets: Int = 64): DataFrame = {
    require(n >= 1, s"quota must be >= 1, got $n")
    val stats = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_gf_c"))
      .agg(max(col("_gf_c")).as("_gf_mx"), sum(col("_gf_c")).as("_gf_tot"))
      .collect()
    val skewed = stats.nonEmpty && !stats(0).isNullAt(0) && {
      val mx = stats(0).getLong(0); val tot = stats(0).getLong(1)
      mx >= AutoSkewShare * tot && mx >= 2L * preThinBuckets * n
    }
    capPerGroup(df, groupCol, keyCol, n, seed,
      preThin = skewed, preThinBuckets = preThinBuckets)
  }

  /** SQL mirror of [[capPerGroup]]'s predicate for a DuckDB oracle (as a
    * QUALIFY clause body). */
  def sqlQualify(groupCol: String, keyCol: String, n: Int, seed: Long = 0L): String =
    s"row_number() OVER (PARTITION BY $groupCol ORDER BY " +
      s"${Sampling.sqlBucket(keyCol, seed, Sampling.QuotaPrime)}, $keyCol) <= $n"
}
