package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, reproducible sampling — the curation counterpart of
  * `df.sample()` for training-data pipelines, where a sample must be (a)
  * stable across reruns/retries (no RNG state per task), (b) a pure
  * per-row predicate (no shuffle, no sort, survives any partitioning),
  * and (c) derivable from a KEY so the same entities are kept across
  * tables/snapshots.
  *
  * The hash is Knuth multiplicative hashing on the key modulo a bucket
  * count — deliberately simple arithmetic (`(key * 2654435761) % 1e6`)
  * kept within BIGINT range so an external SQL engine reproduces the
  * exact sample (xxhash64 would be Spark-only). For adversarial key
  * distributions swap in `xxhash64(key, seed)` — same shape, not
  * SQL-oracle-portable.
  *
  * COMPOSITION (r4 ADVICE): every selector here filters/ranks on a bucket
  * of the same key, and ALL pure mod-Buckets arithmetic over one product
  * is affinely related — so two composed selectors sharing a raw hash are
  * perfectly correlated (quota-then-sample kept ~100% instead of the
  * fraction). Each operator therefore folds the 63-bit product modulo its
  * OWN large prime before the bucket reduction: residues modulo distinct
  * primes are CRT-independent as the product ranges, restoring the
  * fraction contract across different modules on the same key. Composing
  * the SAME module twice on one key still needs distinct `seed`s — the
  * seed varies the MULTIPLIER (an additive seed would only translate
  * buckets, which interval predicates survive).
  */
object Sampling {

  val Buckets = 1000000L
  private val Knuth = 2654435761L

  /** Seeds must stay below this so `(key + seed) * (Knuth + 2·seed)` fits
    * BIGINT at the documented key bound. */
  val MaxSeed = 1000000L

  // Per-operator fold primes (all verified prime; ~1e9 keeps the second
  // multiply-free reduction in BIGINT range for any SQL engine).
  private[graft] val SamplePrime     = 999999937L
  private[graft] val StratifiedPrime = 999999893L
  private[graft] val WeightedPrime   = 999999883L
  private[graft] val SplitPrime      = 999999797L
  private[graft] val QuotaPrime      = 999999761L
  private[graft] val BottomKPrime    = 999999751L
  private[graft] val WeightedKPrime  = 999999599L
  private[graft] val NeymanPrime     = 999999937L

  /** Bucket in [0, Buckets) from a non-negative integral key; keys must
    * stay below ~3.4e9 to avoid BIGINT overflow in external engines (Spark
    * itself would wrap silently). `prime > 0` applies the per-operator
    * fold (see object doc) plus a second multiplicative round whose
    * multiplier varies with `seed`: the multiplier acts on the ~prime-range
    * residue (not the raw key), so even a small seed delta wraps the
    * bucket modulus thousands of times — genuinely independent draws —
    * while every intermediate stays BIGINT-safe (residue < 1e9 × multiplier
    * < 2.7e9). `prime = 0` is the legacy single-fold path. */
  def bucket(key: Column, seed: Long = 0L, prime: Long = 0L): Column = {
    // The [0, MaxSeed) bound exists for the prime-fold path, whose
    // seed-varied multiplier arithmetic needs it to stay BIGINT-safe; the
    // legacy prime=0 path keeps accepting any seed (it is purely additive
    // there) so pre-prime callers don't start throwing. Legacy callers
    // passing |seed| near 2^63 overflow the product in external SQL
    // engines — Spark wraps silently, DuckDB errors loudly.
    if (prime > 0)
      require(seed >= 0 && seed < MaxSeed, s"seed must be in [0, $MaxSeed), got $seed")
    val t = (key.cast("long") + lit(seed)) * lit(Knuth)
    if (prime > 0)
      pmod(pmod(pmod(t, lit(prime)) * lit(Knuth + 2 * seed), lit(prime)), lit(Buckets))
    else pmod(t, lit(Buckets))
  }

  /** [[bucket]] with the key PRE-FOLDED modulo the prime before the
    * first multiply — (residue + seed)·Knuth < 2.66e18 stays BIGINT-safe
    * for ANY non-negative key, where the legacy shape overflows (loudly,
    * under ANSI) past keys ~3.4e9; the Bootstrap replicate draw and the
    * scale ladder's shifted id bands both hit exactly that. NEW
    * operators should prefer this; existing ones keep the legacy shape
    * because their oracle-pinned assignments depend on it. */
  def bucketFolded(key: Column, seed: Long, prime: Long): Column = {
    require(prime > 0, "bucketFolded requires a fold prime")
    require(seed >= 0 && seed < MaxSeed, s"seed must be in [0, $MaxSeed), got $seed")
    val t = (pmod(key.cast("long"), lit(prime)) + lit(seed)) * lit(Knuth)
    pmod(pmod(pmod(t, lit(prime)) * lit(Knuth + 2 * seed), lit(prime)),
      lit(Buckets))
  }

  /** SQL fragment mirroring [[bucketFolded]]. */
  def sqlBucketFolded(key: String, seed: Long, prime: Long): String = {
    require(prime > 0, "bucketFolded requires a fold prime")
    require(seed >= 0 && seed < MaxSeed, s"seed must be in [0, $MaxSeed), got $seed")
    val kf = s"(((CAST($key AS BIGINT) % $prime) + $prime) % $prime)"
    val t = s"(($kf + $seed) * $Knuth)"
    s"((((($t % $prime) + $prime) % $prime) * ${Knuth + 2 * seed}) " +
      s"% $prime % $Buckets)"
  }

  /** Fail fast when the sampling key cannot hash: a non-numeric key casts
    * to NULL buckets, which silently empties a filtering sampler's output
    * and silently degrades quota's selection from hash-uniform to
    * key-ordered — the "silently wrong corpus" failure class the config
    * validation elsewhere exists to prevent. Scale-0 decimals that fit a
    * BIGINT (the usual shape of JDBC/parquet decimal ids) cast losslessly
    * and are accepted. */
  private[graft] def requireIntegralKey(df: DataFrame, keyCol: String): Unit = {
    import org.apache.spark.sql.types._
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case d: DecimalType if d.scale == 0 && d.precision <= 18 => ()
      case other => throw new IllegalArgumentException(
        s"sampling key '$keyCol' must be an integral (or scale-0 decimal ≤ 18 " +
          s"digits) column, got ${other.simpleString} — cast or derive an " +
          "integral id first (a non-numeric key hashes to NULL: filtering " +
          "samplers silently emit nothing, quota selection silently stops " +
          "being hash-uniform)")
    }
  }

  /** Keep ~`fraction` of rows, deterministically by key. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    requireIntegralKey(df, keyCol)
    df.filter(bucket(col(keyCol), seed, SamplePrime) < lit((fraction * Buckets).toLong))
  }

  /** Per-stratum fractions (e.g. downsample the majority class); strata
    * not in the map are dropped — matching pandas-style
    * `groupby().sample(frac=...)` curation semantics. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       seed: Long = 0L): DataFrame = {
    require(fractions.nonEmpty, "at least one stratum fraction required")
    fractions.foreach { case (s, f) =>
      require(f >= 0 && f <= 1, s"fraction $f for stratum '$s' not in [0,1]")
    }
    requireIntegralKey(df, keyCol)
    val b = bucket(col(keyCol), seed, StratifiedPrime)
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === lit(stratum) && b < lit((f * Buckets).toLong))
    }
    df.filter(keep)
  }

  /** EXACTLY-k-per-stratum deterministic sample (a bottom-k sketch): the
    * k rows of each stratum whose key hashes smallest, ranked
    * (bucket asc, key asc). Fraction samplers ([[hashSample]] /
    * [[stratifiedSample]]) cannot promise a fixed size; this is the
    * fixed-BUDGET selector — eval sets, human-review batches, per-source
    * debug samples — with the bottom-k property that the rank-≤-j prefix
    * IS the bottom-j sample (nested subsamples for free) and that the
    * same keys win across reruns and engines (the Knuth bucket, own fold
    * prime, SQL-portable via [[sqlBottomKBucket]]).
    *
    * Scale shape: [[TopK.perGroup]]'s k-bounded typed Aggregator — hash
    * grouping with an O(k) insertion per row, the exchange carrying ≤ k
    * candidates per (stratum, partition) and NO sort anywhere — then one
    * join (strata·k rows, AQE broadcasts it) to recover the full rows.
    * The window form (`row_number() OVER (PARTITION BY stratum ORDER BY
    * bucket, key)`) pays two partition-wide sorts for the same answer
    * and remains the ORACLE formulation.
    *
    * Contract: `keyCol` must be unique within each stratum (it is "the
    * id") — duplicate keys tie in the hash order, where the window
    * oracle numbers them arbitrarily and the aggregator keeps both.
    * Output: the selected rows of `df` plus `sample_rank` (1-based).
    * Strata with fewer than k rows keep them all. */
  def bottomKSample(df: DataFrame, keyCol: String, strataCol: String,
                    k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralKey(df, keyCol)
    val scored = df.select(col(strataCol),
      (-bucket(col(keyCol), seed, BottomKPrime)).cast("double").as("_gf_neg"),
      col(keyCol))
    val sel = TopK.perGroup(scored, Seq(strataCol), "_gf_neg", keyCol, k)
      .select(col(strataCol), col("id").as(keyCol),
        col("rank").as("sample_rank"))
    df.join(sel, Seq(strataCol, keyCol))
  }

  /** SQL fragment mirroring [[bottomKSample]]'s rank order for a DuckDB
    * oracle: `row_number() OVER (PARTITION BY stratum ORDER BY
    * <this>, key)`. */
  def sqlBottomKBucket(key: String, seed: Long = 0L): String =
    sqlBucket(key, seed, BottomKPrime)

  /** Neyman-allocation stratified sampling (Neyman 1934): split a fixed
    * budget `totalN` across strata PROPORTIONAL TO N_h·S_h — bigger and
    * more VARIABLE strata get more samples, the allocation that
    * minimizes the stratified-mean variance at a fixed budget (equal or
    * proportional allocation wastes budget on low-variance strata). The
    * audit-set sizing move: "1000 human reviews across 20 sources, where
    * do they go?".
    *
    * Plan arithmetic, cross-engine exact: N_h exact longs; S_h from
    * (Σv, Σv²) exact-decimal sums of the ≤4dp values rounded to 2dp
    * BEFORE the double conversion (the Trend.ols decSum rule), then the
    * sample-variance closed form + sqrt in a fixed IEEE chain; share =
    * w_h/Σw_h with the total from a strata-bounded window; alloc =
    * min(N_h, floor(totalN·share + 0.5)) — the rounded allocations may
    * sum to totalN ± strata/2 (documented; exact apportionment would
    * need a largest-remainder pass nobody's audit batch needs).
    * Zero-variance strata get alloc 0 (Neyman's own answer: a constant
    * stratum needs ONE observation in theory, zero error either way — a
    * caller wanting coverage floors can max(1, …) downstream);
    * single-row strata have no sample variance and likewise weight 0.
    * An ALL-degenerate family (Σw = 0) refuses — there is no allocation
    * to compute.
    *
    * Selection: the [[bottomKSample]] order (Knuth bucket under its own
    * prime, key tiebreak) cut at each stratum's OWN alloc — same
    * sort-free [[TopK]] aggregator at k = max alloc, then the per-stratum
    * cut by one broadcast join. Output: selected rows + `sample_rank`.
    * [[neymanPlan]] exposes the allocation frame itself. */
  def neymanPlan(df: DataFrame, strataCol: String, valueCol: String,
                 totalN: Int): DataFrame = {
    require(totalN >= 1, s"totalN must be >= 1, got $totalN")
    import org.apache.spark.sql.types.DecimalType
    val v = col(valueCol).cast(DecimalType(14, 4))
    val agg = df.where(col(valueCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(v), 2).cast("double").as("_sv"),
        round(sum(v * v), 2).cast("double").as("_svv"))
    val n = col("n_rows").cast("double")
    val variance = (col("_svv") - col("_sv") * col("_sv") / n) / (n - 1)
    val stddev = when(col("n_rows") >= 2, sqrt(greatest(variance, lit(0.0))))
      .otherwise(lit(0.0))
    val fam = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    // w_h dround'd to a fixed scale, family total as an exact DECIMAL sum
    // (the cvmByPeriod/rbo discipline): a raw double window sum is
    // reduction-order-dependent in the last ulps, and row order after the
    // groupBy shuffle is nondeterministic — a latent hash flake at a
    // dround(share) or floor(totalN·share+0.5) boundary.
    val withW = agg.withColumn("_w", graft.Num.dround(n * stddev, 6))
      .withColumn("_wtot",
        sum(col("_w").cast(DecimalType(38, 6))).over(fam).cast("double"))
    // an all-degenerate family has no allocation basis — refuse loudly
    val share = when(col("_wtot") <= 0.0, raise_error(lit(
      "graft: neyman allocation undefined — every stratum is degenerate " +
        "(zero variance or a single row); nothing to allocate by")))
      .otherwise(col("_w") / col("_wtot"))
    withW.select(col(strataCol), col("n_rows"),
      graft.Num.dround(stddev, 6).as("stddev"),
      graft.Num.dround(share, 6).as("share"),
      least(col("n_rows"),
        floor(lit(totalN.toDouble) * share + lit(0.5)).cast("long"))
        .as("alloc"))
  }

  /** The rows themselves under a [[neymanPlan]] allocation — see there. */
  def neymanSample(df: DataFrame, keyCol: String, strataCol: String,
                   valueCol: String, totalN: Int, seed: Long = 0L): DataFrame = {
    requireIntegralKey(df, keyCol)
    val plan = neymanPlan(df, strataCol, valueCol, totalN)
      .select(col(strataCol), col("alloc"))
    // folded bucket under an own prime: the legacy shape overflows
    // (loudly, under ANSI) past keys ~3.4e9 — the ladder's shifted
    // event-id bands hit exactly that (the weightedKSample precedent)
    val scored = df.select(col(strataCol),
      (-bucketFolded(col(keyCol), seed, NeymanPrime)).cast("double")
        .as("_gf_neg"),
      col(keyCol))
    // one aggregator pass at the global cap, then each stratum's own cut
    val sel = TopK.perGroup(scored, Seq(strataCol), "_gf_neg", keyCol, totalN)
      .select(col(strataCol), col("id").as(keyCol),
        col("rank").as("sample_rank"))
      .join(broadcast(plan), Seq(strataCol))
      .where(col("sample_rank") <= col("alloc"))
      .drop("alloc")
    df.join(sel, Seq(strataCol, keyCol))
  }

  /** Exact-k WEIGHTED sampling without replacement per stratum
    * (Efraimidis & Spirakis 2006): each row draws key u^(1/w) and the
    * top-k keys are a weighted sample without replacement — the
    * mixture-sampling primitive ([[weightedSample]] keeps each row
    * independently, so stratum sizes float; this hits exactly k with
    * selection pressure ∝ weight). Ranked on the monotone-equivalent
    * ln(u)/w (one ln + one divide on deterministic operands — no pow,
    * whose cross-engine rounding is unpinned), u = (bucket + 0.5)/10⁶
    * from the portable Knuth bucket under an own prime, selection via
    * the sort-free k-bounded [[TopK]] aggregator. Null weights drop the
    * row (the weightedSample convention); non-positive or NaN weights
    * refuse loudly — they would silently win every draw. */
  def weightedKSample(df: DataFrame, keyCol: String, strataCol: String,
                      weightCol: String, k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralKey(df, keyCol)
    val w = col(weightCol).cast("double")
    val guarded = when(w <= 0.0 || w.isNaN, raise_error(concat(
      lit(s"graft: weightedKSample weight '$weightCol' must be positive, got "),
      w.cast("string")))).otherwise(w)
    // folded bucket (not the legacy shape): the draw stays BIGINT-safe
    // for any key — the ×16 ladder band that overflowed the Bootstrap
    // draw would hit this sampler identically (see bucketFolded's doc)
    val u = (bucketFolded(col(keyCol), seed, WeightedKPrime).cast("double") + 0.5) /
      Buckets.toDouble
    val scored = df.where(w.isNotNull)
      .select(col(strataCol), (log(u) / guarded).as("_gf_aes"), col(keyCol))
    val sel = TopK.perGroup(scored, Seq(strataCol), "_gf_aes", keyCol, k)
      .select(col(strataCol), col("id").as(keyCol),
        col("rank").as("sample_rank"))
    df.join(sel, Seq(strataCol, keyCol))
  }

  /** SQL fragment mirroring [[weightedKSample]]'s A-ES score — rank with
    * `row_number() OVER (PARTITION BY stratum ORDER BY <this> DESC, key)`. */
  def sqlWeightedKScore(key: String, weight: String, seed: Long = 0L): String =
    s"(ln((${sqlBucketFolded(key, seed, WeightedKPrime)} + 0.5) / ${Buckets}.0) " +
      s"/ CAST($weight AS DOUBLE))"

  /** Quality-weighted deterministic sampling — keep each row with
    * probability `weight` (its own column, clamped to [0,1]; NULL weights
    * drop the row), decided by the same key hash as [[hashSample]] so the
    * decision is reproducible per entity and shuffle-free at any scale.
    * The standard curation move: weight = quality score, so low-quality
    * documents are downsampled instead of hard-dropped (importance
    * resampling, à la the DoReMi/quality-weighted corpus recipes). */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     seed: Long = 0L): DataFrame = {
    requireIntegralKey(df, keyCol)
    val w = least(lit(1.0), greatest(lit(0.0), weight))
    df.filter(bucket(col(keyCol), seed, WeightedPrime) <
      floor(w * lit(Buckets.toDouble)).cast("long"))
  }

  /** Deterministic train/validation/test split: each row lands in exactly
    * one named bucket by its key hash, with the given fractions (must sum
    * to 1 within 1e-9 — silent remainder rows would vanish from every
    * split). Entity-keyed, so the same document lands in the same split
    * across reruns and across derived tables keyed by the same id — the
    * leakage-safety property a random split lacks. Pure per-row
    * projection; no shuffle. */
  def split(df: DataFrame, keyCol: String,
            fractions: Seq[(String, Double)], seed: Long = 0L): DataFrame = {
    require(fractions.nonEmpty, "at least one split required")
    fractions.foreach { case (n, f) =>
      require(f >= 0 && f <= 1, s"fraction $f for split '$n' not in [0,1]")
    }
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    requireIntegralKey(df, keyCol)
    val b = bucket(col(keyCol), seed, SplitPrime)
    // round, not truncate: a float cumsum like 0.7+0.2 = 0.8999... would
    // otherwise shift boundary buckets into the wrong split
    val cuts = splitCuts(fractions)
    // CASE WHEN b < cut1 THEN name1 WHEN b < cut2 THEN name2 ... ELSE last
    val head = when(b < lit(cuts.head), lit(fractions.head._1))
    val chained = fractions.zip(cuts).drop(1).dropRight(1).foldLeft(head) {
      case (acc, ((name, _), cut)) => acc.when(b < lit(cut), lit(name))
    }
    df.withColumn("split", chained.otherwise(lit(fractions.last._1)))
  }

  /** Cumulative bucket cuts shared by [[split]] and [[sqlSplit]]. */
  private def splitCuts(fractions: Seq[(String, Double)]): Seq[Long] =
    fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(c => math.round(c * Buckets))

  /** SQL fragment mirroring [[split]]'s CASE for a DuckDB oracle. A
    * single-fraction split has no WHEN branch — emit the bare name (a
    * branchless CASE is a syntax error in ANSI engines). */
  def sqlSplit(key: String, fractions: Seq[(String, Double)],
               seed: Long = 0L): String = {
    val whens = fractions.zip(splitCuts(fractions)).dropRight(1)
      .map { case ((name, _), cut) =>
        s"WHEN ${sqlBucket(key, seed, SplitPrime)} < $cut THEN '$name'"
      }.mkString(" ")
    if (whens.isEmpty) s"'${fractions.last._1}'"
    else s"CASE $whens ELSE '${fractions.last._1}' END"
  }

  /** SQL fragment mirroring [[hashSample]]'s keep predicate. */
  def sqlHashKeep(key: String, fraction: Double, seed: Long = 0L): String =
    s"${sqlBucket(key, seed, SamplePrime)} < ${(fraction * Buckets).toLong}"

  /** SQL fragment mirroring [[stratifiedSample]]'s per-stratum bucket. */
  def sqlStratifiedBucket(key: String, seed: Long = 0L): String =
    sqlBucket(key, seed, StratifiedPrime)

  /** SQL fragment mirroring [[weightedSample]]'s keep predicate. */
  def sqlWeightedKeep(key: String, weightExpr: String, seed: Long = 0L): String =
    s"${sqlBucket(key, seed, WeightedPrime)} < CAST(floor(least(1.0, greatest(0.0, $weightExpr)) * $Buckets) AS BIGINT)"

  /** SQL fragment mirroring [[bucket]] for a DuckDB oracle. Spark's
    * `pmod` is always non-negative while ANSI `%` is sign-preserving, so
    * the mirror must wrap the remainder back into [0, Buckets) or the two
    * engines silently pick different rows for negative keys. */
  def sqlBucket(key: String, seed: Long = 0L, prime: Long = 0L): String = {
    // Mirror bucket(): the seed bound is scoped to the prime-fold path.
    if (prime > 0)
      require(seed >= 0 && seed < MaxSeed, s"seed must be in [0, $MaxSeed), got $seed")
    val t = s"((CAST($key AS BIGINT) + $seed) * $Knuth)"
    if (prime > 0)
      s"((((($t % $prime) + $prime) % $prime) * ${Knuth + 2 * seed}) % $prime % $Buckets)"
    else s"((($t % $Buckets) + $Buckets) % $Buckets)"
  }
}
