package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — approximate
  * frequency counting in FIXED d·w state, the bounded-memory counterpart
  * of exact heavy-hitter counting ([[Skew.heavyHitters]]): when the key
  * cardinality is unbounded (urls, ngrams, session keys at crawl scale),
  * an exact groupBy's state grows with the data while the sketch never
  * exceeds d·w counters — and two sketches MERGE by cell-wise addition,
  * so per-executor/per-day sketches combine associatively (the property
  * that makes it a streaming/partial-aggregation citizen).
  *
  * Spark-first: the counter matrix IS a groupBy — each key explodes to
  * its d (row, cell) coordinates and one map-side-combined count builds
  * all rows in a single exchange of ≤ d·w combined rows per partition.
  * Estimation joins probe cells against the populated counters (absent
  * cell = 0) and takes the row-wise MIN: estimates never undercount, and
  * overcount by the collision mass in the probe's luckiest row — the
  * classic ε = e/w, δ = e^−d guarantee.
  *
  * The row hashes are the engine's portable integer family — Knuth
  * multiplicative scatter folded by a PER-ROW prime (fresh primes,
  * CRT-independent of every Sampling selector on the same key), exact in
  * 64-bit arithmetic for keys ≤ ~3.4e9 — so an external SQL engine
  * recomputes the SKETCH ITSELF verbatim, collisions included (the
  * registry query is hash-green: estimate ≡ oracle estimate cell for
  * cell). A same-engine hash (xxhash64) would sketch equally well but be
  * unverifiable outside Spark.
  */
object CountMin {

  private val Knuth = 2654435761L

  /** Per-row fold primes; depth ≤ 8. Deliberately SPREAD across
    * magnitudes (1e9 … 3e8), not clustered: residues of one product
    * modulo NEARBY primes differ by a nearly-constant offset
    * (v mod P₁ ≈ v mod P₀ + ⌊v/P⌋·ΔP), which correlates sketch rows and
    * voids the min-over-rows guarantee — measured first-hand with a
    * clustered family (22% conditional collision rate vs the ideal 1/w;
    * the spread family + the second multiplicative round measures
    * 0.104–0.119 at w = 8). All fresh values, disjoint from
    * [[Sampling]]'s operator primes (CRT-independence against samplers
    * composed on the same key). */
  val RowPrimes: Seq[Long] = Seq(
    999999677L, 899999963L, 799999999L, 699999953L,
    599999971L, 499999993L, 399999959L, 299999977L)

  /** Largest key the exact-arithmetic contract covers (the
    * [[Sharding.MaxId]] bound: key·Knuth must not wrap). */
  val MaxKey: Long = Long.MaxValue / Knuth

  /** Cell of `key` in sketch row `j`:
    * (((key·M) mod P_j) · (M + 2j)) mod P_j mod w — the [[Sampling
    * .bucket]] double-fold: the second multiply acts on the ~P_j-range
    * residue with a per-row multiplier, decorrelating rows beyond what
    * distinct moduli alone give (see [[RowPrimes]]). Every intermediate
    * stays in BIGINT (residue < 1e9, multiplier < 2.7e9). Exact in plain
    * 64-bit arithmetic; out-of-range keys fail loudly (a wrapped product
    * would land in a silently different cell than every other engine
    * computes). */
  def cell(key: Column, j: Int, width: Int): Column = {
    require(j >= 0 && j < RowPrimes.size,
      s"row $j out of range — depth is capped at ${RowPrimes.size}")
    require(width >= 1, s"width must be >= 1, got $width")
    val k = key.cast("long")
    val p = RowPrimes(j)
    when(k.isNull || k < 0 || k > MaxKey,
      raise_error(concat(lit("graft: CountMin key out of range ("),
        k.cast("string"),
        lit(s") — need 0 <= key <= $MaxKey for exact cell arithmetic")))
        .cast("long"))
      .otherwise(
        k * lit(Knuth) % lit(p) * lit(Knuth + 2L * j) % lit(p) % lit(width.toLong))
  }

  private def checkShape(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= RowPrimes.size,
      s"depth must be in [1, ${RowPrimes.size}], got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
  }

  /** Build the sketch: (row, cell, cnt) over the POPULATED cells only
    * (absent = 0). One explode to d coordinate rows per key occurrence +
    * one map-side-combined count — the exchange carries ≤ d·w combined
    * rows per partition no matter the corpus. Weighted occurrences pass
    * `weight` (default 1 per row). */
  def sketch(df: DataFrame, keyCol: String, depth: Int, width: Int,
             weight: Column = lit(1L)): DataFrame = {
    checkShape(depth, width)
    df.select(col(keyCol), weight.cast("long").as("_gf_w"),
        explode(array((0 until depth).map(lit(_)): _*)).as("row"))
      .select(col("row"),
        // per-row cell: a CASE over the d primes keeps this one codegen'd
        // projection instead of d unioned scans
        (0 until depth).foldLeft(lit(-1L)) { (acc, j) =>
          when(col("row") === j, cell(col(keyCol), j, width)).otherwise(acc)
        }.as("cell"),
        col("_gf_w"))
      .groupBy("row", "cell")
      .agg(sum(col("_gf_w")).as("cnt"))
  }

  /** Merge sketches built with the SAME (depth, width): cell-wise
    * addition — the associativity that lets per-executor / per-batch /
    * per-day sketches combine without ever seeing each other's keys. */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "merge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy("row", "cell")
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Estimate each probe key's frequency: min over the d rows of its
    * cell counters (absent cell = 0). `probes` must carry distinct keys
    * in `keyCol`. The join is against the ≤ d·w-row sketch — broadcast
    * by size, so probing never shuffles the probe frame. */
  def estimate(sk: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int, width: Int): DataFrame = {
    checkShape(depth, width)
    val pc = probes.select(col(keyCol),
        explode(array((0 until depth).map(lit(_)): _*)).as("row"))
      .select(col(keyCol), col("row"),
        (0 until depth).foldLeft(lit(-1L)) { (acc, j) =>
          when(col("row") === j, cell(col(keyCol), j, width)).otherwise(acc)
        }.as("cell"))
    pc.join(sk, Seq("row", "cell"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Equi-join OUTPUT-size estimate from two sketches of the join key,
    * built with the SAME (depth, width) — the CMS inner-product
    * estimator (Cormode & Muthukrishnan 2005 §4.2): |A ⋈ B| =
    * Σ_k fA(k)·fB(k) is estimated per sketch row by the cell-wise inner
    * product Σ_c a[j,c]·b[j,c] and tightened by the MIN over rows; never
    * undercounts, overcounts by the collision cross-mass (≤ e/w·N_A·N_B
    * per row). The planner-side cardinality probe at 100 TB: d·w integer
    * products decide broadcast vs shuffle vs salt WITHOUT running the
    * join — and since [[sketch]] materializes cells sparsely (≤ d ×
    * distinct-keys rows), `width` is a modulus, not storage: millions of
    * cells cost a fingernail of state, which is what makes the
    * cross-mass small enough to read. A row sharing NO populated cells
    * has inner product 0 and participates in the min (the estimate is 0
    * only when some row sees zero overlap — a certifiably tiny join). */
  def joinSizeEstimate(skA: DataFrame, skB: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= RowPrimes.size,
      s"depth must be in [1, ${RowPrimes.size}], got $depth")
    val ip = skA.withColumnRenamed("cnt", "_gf_ca")
      .join(skB.withColumnRenamed("cnt", "_gf_cb"), Seq("row", "cell"))
      .groupBy("row")
      .agg(sum(col("_gf_ca") * col("_gf_cb")).as("_gf_ip"))
    skA.sparkSession.range(depth)
      .select(col("id").cast("int").as("row"))
      .join(ip, Seq("row"), "left")
      .agg(min(coalesce(col("_gf_ip"), lit(0L))).as("est_join_size"))
  }

  /** SQL fragment mirroring [[cell]] for a DuckDB oracle; `j` must be a
    * literal row index. */
  def sqlCell(key: String, j: Int, width: Int): String = {
    require(j >= 0 && j < RowPrimes.size,
      s"row $j out of range — depth is capped at ${RowPrimes.size}")
    val p = RowPrimes(j)
    s"(((($key) * $Knuth) % $p) * ${Knuth + 2L * j}) % $p % $width"
  }

  /** SQL CASE over the d rows, mirroring the sketch/estimate projection
    * (`rowExpr` names the row-index column). */
  def sqlCellCase(key: String, rowExpr: String, depth: Int,
                  width: Int): String = {
    checkShape(depth, width)
    (0 until depth).map(j =>
      s"WHEN $rowExpr = $j THEN ${sqlCell(key, j, width)}")
      .mkString("CASE ", " ", " END")
  }
}
