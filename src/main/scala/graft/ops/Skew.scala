package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §5). AQE's skew-join split
  * handles sort-merge skew automatically; this explicit salt is for the
  * cases AQE can't re-plan — measured first-hand in the SCALING.md skew
  * rung (graft.SkewProbe): `OptimizeSkewedJoin` pattern-matches
  * `SMJ(Sort(Shuffle), Sort(Shuffle))`, so a dimension arriving through
  * its own unmaterialized aggregation (a lazy `distinct()` interposes a
  * HashAggregate under the Sort) silently disables the rule, as does a
  * downstream operator relying on the join's output partitioning (a
  * groupBy on the join key — the split would break key co-location), a
  * broadcast-ineligible dimension on a power-law key, or a plan where
  * runtime re-optimization is disabled.
  *
  * Shape: the FACT side gets a deterministic salt in [0, factor) derived
  * by hashing stable columns (never `rand()` — results must be
  * reproducible across retries/partitions); the DIM side is exploded
  * `factor`× with every salt value. The join key becomes (key, salt), so
  * one hot key spreads over `factor` reducers at the cost of duplicating
  * only the small side.
  */
object Skew {

  /** Deterministic salt in [0, factor) from `seedCols` (use stable id
    * columns of the fact row). */
  def saltColumn(factor: Int, seedCols: Seq[Column]): Column =
    pmod(xxhash64(seedCols: _*), lit(factor.toLong)).cast("int")

  /** Equi-join `fact` with (small) `dim` on `key`, salted `factor` ways.
    * `seedCols` must be stable fact columns. Output columns = fact ++ dim
    * (minus dim's join key). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 factor: Int, seedCols: Seq[Column]): DataFrame = {
    val saltedFact = fact.withColumn("_gf_salt", saltColumn(factor, seedCols))
    val saltedDim = dim
      .withColumn("_gf_salt", explode(lit((0 until factor).toArray)))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact("_gf_salt") === saltedDim("_gf_salt"))
      .drop(saltedDim(key)).drop(saltedDim("_gf_salt")).drop("_gf_salt")
  }

  /** Heavy-hitter diagnostic: the top-`k` values of a prospective join/
    * group key with their row share — the measurement that decides whether
    * a join needs [[saltedJoin]] (one key holding >1-2% of a 100 TB fact
    * table means one reducer owns that share). Nothing but (key, count)
    * pairs ever shuffles: a keyed count with map-side combine feeds the
    * sort-limit top-k, and the total is a plain count (partial counts →
    * one merged row, broadcast). The source is scanned twice — when
    * diagnosing many keys of the same (expensive) input, persist it first
    * and pass the cached frame. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    // plain count, not counts.agg(sum): same value, but skips a second
    // keyed shuffle — the cheap flavor of the unavoidable second pass
    val total = df.agg(count(lit(1)).as("_gf_total"))
    counts.orderBy(col("cnt").desc, col(keyCol)).limit(k)
      .crossJoin(broadcast(total))
      .select(col(keyCol), col("cnt"),
        graft.Num.dround(col("cnt").cast("double") / col("_gf_total").cast("double"), 6)
          .as("share"))
  }

  /** Two-phase aggregation for skewed group keys: aggregate on
    * (key, salt) first (spreads a hot key over `factor` reducers), then
    * merge the partials per key. `partialAggs` must be re-aggregatable
    * (sum/count/min/max...): pass the partial expression and the merge
    * expression by name. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                factor: Int, seedCols: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_gf_salt", saltColumn(factor, seedCols))
    salted.groupBy((keys.map(col) :+ col("_gf_salt")): _*)
      .agg(sum(col(valueCol)).as("_gf_partial"), count(lit(1)).as("_gf_n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_gf_partial")).as(s"sum_$valueCol"),
        sum(col("_gf_n")).as("n_rows"))
  }
}
