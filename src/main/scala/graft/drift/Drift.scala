package graft.drift

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Base-vs-target dataset drift — Spark-native counterpart of the
  * reference's `mcp_server/tools/drift.py`.
  *
  * Schema drift is resolved from the two schemas (no scan). Numeric drift
  * computes per-column means in ONE aggregation pass per side (exact
  * decimal accumulation, deterministic across engines/partitionings),
  * then joins the two 1-row results.
  */
object Drift {

  /** Full comparison — (schema drift, numeric drift), the reference's
    * toolkit_drift_detection response split into two frames. */
  def compare(base: DataFrame, target: DataFrame): (DataFrame, DataFrame) =
    (schemaDrift(base, target), numericDrift(base, target))

  /** Added/removed columns + dtype changes (drift.py:39-56). */
  def schemaDrift(base: DataFrame, target: DataFrame): DataFrame = {
    val b = base.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val t = target.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val rows =
      t.keySet.diff(b.keySet).toSeq.sorted.map(c => Row("added_column", c, null, t(c))) ++
      b.keySet.diff(t.keySet).toSeq.sorted.map(c => Row("removed_column", c, b(c), null)) ++
      b.keySet.intersect(t.keySet).toSeq.sorted
        .filter(c => b(c) != t(c)).map(c => Row("dtype_change", c, b(c), t(c)))
    val schema = StructType(Seq(
      StructField("change", StringType), StructField("column_name", StringType),
      StructField("base_dtype", StringType), StructField("target_dtype", StringType)))
    base.sparkSession.createDataFrame(
      base.sparkSession.sparkContext.parallelize(rows, 1), schema)
      .orderBy("change", "column_name")
  }

  /** Mean-shift metrics for shared numeric columns (drift.py:58-75):
    * (column, base_mean, target_mean, diff_pct). diff_pct mirrors the
    * reference: |t-b| / (|b| + 1e-9). */
  def numericDrift(base: DataFrame, target: DataFrame): DataFrame = {
    val shared = base.schema.fields
      .filter(f => f.dataType.isInstanceOf[NumericType])
      .map(_.name)
      .filter(c => target.schema.fields.exists(f =>
        f.name == c && f.dataType.isInstanceOf[NumericType]))
      .sorted.toSeq

    def meansRow(df: DataFrame, prefix: String): DataFrame = {
      val aggs = shared.map { c =>
        (sum(col(c).cast(DecimalType(30, 6))).cast(DoubleType) / count(col(c)))
          .as(s"${prefix}_$c")
      }
      df.agg(aggs.head, aggs.tail: _*)
    }

    val joined = meansRow(base, "b").crossJoin(meansRow(target, "t"))
    val entries = shared.map { c =>
      struct(
        lit(c).as("column_name"),
        graft.Num.dround(col(s"b_$c"), 4).as("base_mean"),
        graft.Num.dround(col(s"t_$c"), 4).as("target_mean"),
        graft.Num.dround(abs(col(s"t_$c") - col(s"b_$c")) / (abs(col(s"b_$c")) + lit(1e-9)), 4)
          .as("diff_pct"))
    }
    joined.select(explode(array(entries.toIndexedSeq: _*)).as("e")).select("e.*")
      .orderBy("column_name")
  }

  /** Population Stability Index over fixed-width bins derived from the BASE
    * distribution — the standard production drift score (PSI < 0.1 stable,
    * 0.1-0.25 moderate, > 0.25 major shift). Extends the reference's
    * mean-only numeric drift (drift.py:58-75) with a distribution-shape test.
    *
    * Output: one row per bin (bin_id, base_pct, target_pct, psi_term) plus
    * the total in every row (psi_total) so a single-row consumer can slice.
    *
    * Scale: bounds pass is a 1-row aggregate on base; each side then
    * aggregates to at most `bins` rows (map-side partial combine) — nothing
    * larger than `bins` rows ever shuffles, so this runs at 100 TB as two
    * scans. Proportions are clamped at 1e-6 before the log ratio (the
    * standard PSI epsilon for empty bins). */
  /** bin_id in [0, bins): fixed width over [_gf_lo, _gf_hi], top edge
    * closed — THE binning of every PSI flavor (single, per-column sweep,
    * time series), so clamping semantics cannot de-sync between them.
    * Constant base (hi == lo) → everything in bin 0: without the guard
    * the zero width makes floor(0/0) NaN and the ANSI int cast throws.
    * NULL bounds (empty/all-null base) → bin 0, so target rows still
    * count into n_target while the psi totals null out via the
    * empty-base guards. Clamp in DOUBLE space BEFORE the int cast: a
    * target outlier far outside the base range (the exact thing PSI
    * detects) would overflow an unclamped ANSI int cast and kill the
    * job. */
  private def psiBinId(v: Column, bins: Int): Column = {
    val width = (col("_gf_hi") - col("_gf_lo")) / lit(bins.toDouble)
    when(col("_gf_lo").isNull || col("_gf_hi") === col("_gf_lo"), lit(0))
      .otherwise(
        least(lit((bins - 1).toDouble),
          greatest(lit(0.0), floor((v - col("_gf_lo")) / width))).cast("int"))
  }

  /** The epsilon-clamped, 6-dp-rounded PSI term — single owner for every
    * PSI flavor and the shape the SQL oracles mirror. */
  private def psiTerm(bp: Column, tp: Column): Column = {
    val eps = lit(1e-6)
    graft.Num.dround((greatest(tp, eps) - greatest(bp, eps))
      * log(greatest(tp, eps) / greatest(bp, eps)), 6)
  }

  def psi(base: DataFrame, target: DataFrame, column: String,
          bins: Int = 10): DataFrame = {
    require(bins > 0, s"psi needs bins > 0, got $bins")
    val x = col(column).cast(DoubleType)
    val bounds = base.agg(min(x).as("_gf_lo"), max(x).as("_gf_hi"))
    def binId(v: Column): Column = psiBinId(v, bins)
    // ONE side-tagged counting pass for both frames (each side scanned
    // once, plus the base-only bounds pass) instead of a per-side
    // aggregate + join chain. Every non-null row lands in exactly one bin,
    // so the side totals are recovered from the ≤bins aggregate rows by a
    // free window sum — same integers, no extra count scans.
    val tagged = base.filter(x.isNotNull).select(x.as("_gf_x"), lit(0).as("_gf_side"))
      .unionByName(target.filter(x.isNotNull).select(x.as("_gf_x"), lit(1).as("_gf_side")))
    val counts = tagged.crossJoin(broadcast(bounds))
      .groupBy(binId(col("_gf_x")).as("bin_id")).agg(
        count(when(col("_gf_side") === 0, 1)).as("base_cnt"),
        count(when(col("_gf_side") === 1, 1)).as("target_cnt"))
    val allBins = base.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin_id"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val joined = allBins
      .join(counts, Seq("bin_id"), "left")
      .withColumn("base_cnt", coalesce(col("base_cnt"), lit(0L)))
      .withColumn("target_cnt", coalesce(col("target_cnt"), lit(0L)))
      // The >0 guards never bind on non-empty sides (so the oracle SQL
      // needs no mirror); on an EMPTY side they turn a 0/0 NaN — which the
      // ANSI decimal cast below would reject — into null, which greatest()
      // then treats as the epsilon-clamped empty bin.
      .withColumn("base_pct",
        when(sum("base_cnt").over(tot) > 0,
          col("base_cnt").cast(DoubleType) / sum("base_cnt").over(tot).cast(DoubleType)))
      .withColumn("target_pct",
        when(sum("target_cnt").over(tot) > 0,
          col("target_cnt").cast(DoubleType) / sum("target_cnt").over(tot).cast(DoubleType)))
      // Terms are rounded BEFORE totaling and the total is an exact
      // decimal sum of the rounded terms — a plain double sum is
      // reduction-order-dependent (the Q.dsum discipline).
      .withColumn("psi_term", psiTerm(col("base_pct"), col("target_pct")))
    joined
      // An empty/all-null SIDE must not read as "no drift": psi_total
      // nulls out unless both sides contributed rows (never binds on
      // real data, so the oracle needs no mirror).
      .withColumn("psi_total",
        when(sum("base_cnt").over(tot) > 0 && sum("target_cnt").over(tot) > 0,
          sum(col("psi_term").cast(DecimalType(38, 6)))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(lit(1)))
            .cast(DoubleType)))
      .select(
        col("bin_id"),
        graft.Num.dround(col("base_pct"), 6).as("base_pct"),
        graft.Num.dround(col("target_pct"), 6).as("target_pct"),
        col("psi_term"),
        col("psi_total"))
      .orderBy("bin_id")
  }

  /** Bounded-divergence pack over the [[psi]] binning: Jensen-Shannon
    * divergence (the symmetric, ln2-bounded KL — Lin 1991), squared
    * Hellinger distance, and total variation, per bin + totals, in the
    * SAME single side-tagged counting pass as [[psi]]. PSI's ε-clamp is
    * unnecessary here: every term is well-defined at zero mass
    * (p·ln(p/m) → 0, (√p−√q)² and |p−q| are plain arithmetic), so the
    * pack reports exact zero-bin behavior where PSI reports a clamped
    * approximation — the reason drift dashboards carry both.
    *
    * Scale shape: identical to [[psi]] — each side scans once, ≤ `bins`
    * aggregate rows ever shuffle, totals are window sums over the
    * bin-sized frame. Cross-engine parity: terms are single IEEE ops on
    * identical operands (ln included — the LM-oracle precedent), rounded
    * to 6dp BEFORE the exact-decimal total (the Q.dsum discipline);
    * Hellinger's final sqrt applies to the already-exact total. */
  def divergences(base: DataFrame, target: DataFrame, column: String,
                  bins: Int = 10): DataFrame = {
    require(bins > 0, s"divergences needs bins > 0, got $bins")
    val x = col(column).cast(DoubleType)
    val bounds = base.agg(min(x).as("_gf_lo"), max(x).as("_gf_hi"))
    val tagged = base.filter(x.isNotNull).select(x.as("_gf_x"), lit(0).as("_gf_side"))
      .unionByName(target.filter(x.isNotNull).select(x.as("_gf_x"), lit(1).as("_gf_side")))
    val counts = tagged.crossJoin(broadcast(bounds))
      .groupBy(psiBinId(col("_gf_x"), bins).as("bin_id")).agg(
        count(when(col("_gf_side") === 0, 1)).as("base_cnt"),
        count(when(col("_gf_side") === 1, 1)).as("target_cnt"))
    val allBins = base.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin_id"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val p = col("base_pct"); val q = col("target_pct")
    val m = (p + q) / lit(2.0)
    // KL pieces with the 0·ln(0) → 0 convention; m = 0 only when both
    // sides are 0, where both pieces are already 0.
    val jsTerm = graft.Num.dround(
      lit(0.5) * when(p > 0, p * log(p / m)).otherwise(lit(0.0)) +
        lit(0.5) * when(q > 0, q * log(q / m)).otherwise(lit(0.0)), 6)
    val hellTerm = graft.Num.dround(
      (sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)), 6)
    val tvTerm = graft.Num.dround(lit(0.5) * abs(p - q), 6)
    def decTotal(term: Column): Column =
      sum(term.cast(DecimalType(38, 6))).over(tot).cast(DoubleType)
    val bothSides =
      sum("base_cnt").over(tot) > 0 && sum("target_cnt").over(tot) > 0
    allBins
      .join(counts, Seq("bin_id"), "left")
      .withColumn("base_cnt", coalesce(col("base_cnt"), lit(0L)))
      .withColumn("target_cnt", coalesce(col("target_cnt"), lit(0L)))
      // Empty-side guards mirror [[psi]]: never bind on real data, so the
      // oracle needs no mirror.
      .withColumn("base_pct",
        when(sum("base_cnt").over(tot) > 0,
          col("base_cnt").cast(DoubleType) / sum("base_cnt").over(tot).cast(DoubleType)))
      .withColumn("target_pct",
        when(sum("target_cnt").over(tot) > 0,
          col("target_cnt").cast(DoubleType) / sum("target_cnt").over(tot).cast(DoubleType)))
      .withColumn("js_term", jsTerm)
      .withColumn("hell_term", hellTerm)
      .withColumn("tv_term", tvTerm)
      .withColumn("js_div", when(bothSides, decTotal(col("js_term"))))
      .withColumn("hellinger",
        when(bothSides, graft.Num.dround(sqrt(lit(0.5) * decTotal(col("hell_term"))), 6)))
      .withColumn("tv_dist", when(bothSides, decTotal(col("tv_term"))))
      .select(col("bin_id"),
        graft.Num.dround(col("base_pct"), 6).as("base_pct"),
        graft.Num.dround(col("target_pct"), 6).as("target_pct"),
        col("js_term"), col("hell_term"), col("tv_term"),
        col("js_div"), col("hellinger"), col("tv_dist"))
      .orderBy("bin_id")
  }

  /** Per-column PSI sweep: one [[psi]]-style total per numeric column —
    * the full-feature drift dashboard in ONE pass per side. Columns melt
    * to (column_name, value) rows (a projection, not a shuffle), bounds
    * for ALL columns come from one 1-row base aggregate, and a single
    * (column, bin) keyed count covers both sides — ≤ columns×bins rows
    * ever shuffle. Per-column totals follow the [[psi]] discipline
    * (decimal sum of rounded terms; null unless both sides contributed
    * rows to that column). */
  def psiAll(base: DataFrame, target: DataFrame, columns: Seq[String],
             bins: Int = 10): DataFrame = {
    require(columns.nonEmpty, "psiAll needs at least one column")
    require(columns.map(_.toLowerCase).distinct.size == columns.size,
      s"psiAll columns must be distinct (case-insensitively — Spark's " +
        s"default resolution), got $columns — a duplicate would alias two " +
        "identical bound aggregates and fail as AMBIGUOUS_REFERENCE")
    require(columns.forall(!_.contains(".")),
      s"psiAll needs top-level column names, got $columns")
    require(bins > 0, s"psiAll needs bins > 0, got $bins")
    val boundsRow = {
      val aggs = columns.flatMap { c =>
        Seq(min(col(c).cast(DoubleType)).as(s"_gf_lo_$c"),
          max(col(c).cast(DoubleType)).as(s"_gf_hi_$c"))
      }
      base.agg(aggs.head, aggs.tail: _*)
    }
    val bounds = boundsRow.select(explode(array(columns.map(c =>
        struct(lit(c).as("column_name"),
          col(s"_gf_lo_$c").as("_gf_lo"), col(s"_gf_hi_$c").as("_gf_hi"))): _*)).as("b"))
      .select("b.*")
    def melt(df: DataFrame, side: Int): DataFrame = df
      .select(explode(array(columns.map(c =>
        struct(lit(c).as("column_name"), col(c).cast(DoubleType).as("_gf_x"))): _*)).as("m"))
      .select("m.*").filter(col("_gf_x").isNotNull)
      .withColumn("_gf_side", lit(side))
    val counts = melt(base, 0).unionByName(melt(target, 1))
      .join(broadcast(bounds), Seq("column_name"))
      .groupBy(col("column_name"), psiBinId(col("_gf_x"), bins).as("bin_id"))
      .agg(count(when(col("_gf_side") === 0, 1)).as("base_cnt"),
        count(when(col("_gf_side") === 1, 1)).as("target_cnt"))
    val cols = bounds.select("column_name")
    val allBins = base.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin_id"))
    val perCol = org.apache.spark.sql.expressions.Window.partitionBy("column_name")
    val cells = cols.crossJoin(allBins)
      .join(counts, Seq("column_name", "bin_id"), "left")
      .withColumn("base_cnt", coalesce(col("base_cnt"), lit(0L)))
      .withColumn("target_cnt", coalesce(col("target_cnt"), lit(0L)))
      .withColumn("bp", when(sum("base_cnt").over(perCol) > 0,
        col("base_cnt").cast(DoubleType) / sum("base_cnt").over(perCol).cast(DoubleType)))
      .withColumn("tp", when(sum("target_cnt").over(perCol) > 0,
        col("target_cnt").cast(DoubleType) / sum("target_cnt").over(perCol).cast(DoubleType)))
      .withColumn("psi_term", psiTerm(col("bp"), col("tp")))
    cells.groupBy("column_name")
      .agg(
        sum("base_cnt").as("n_base"),
        sum("target_cnt").as("n_target"),
        when(sum("base_cnt") > 0 && sum("target_cnt") > 0,
          sum(col("psi_term").cast(DecimalType(38, 6))).cast(DoubleType))
          .as("psi_total"))
      .orderBy("column_name")
  }

  /** PSI time series: one [[psi]]-style total per PERIOD of the target
    * against a fixed base reference — the "daily drift dashboard" query
    * every model-monitoring pipeline schedules. `periodCol` must be an
    * integral target column (e.g. `year*100+month` derived upstream);
    * bins come from the BASE bounds so every period is scored on the
    * same grid and totals are comparable across periods.
    *
    * Scale: one 1-row bounds pass on base, one ≤bins aggregate on base
    * (whose window sum IS the base total — no extra count scan, the
    * [[psi]] trick), one ≤periods×bins aggregate on target (map-side
    * combined) — nothing larger ever shuffles. Output:
    * (period, n_target, psi_total), one row per period present in the
    * target; psi_total is the exact decimal sum of 6-dp-rounded terms
    * (the [[psi]] discipline) and is null when the base is empty —
    * n_target stays the real row count even then (null bounds bin
    * everything into bin 0 rather than dropping rows). */
  def psiByPeriod(base: DataFrame, target: DataFrame, column: String,
                  periodCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, s"psiByPeriod needs bins > 0, got $bins")
    val x = col(column).cast(DoubleType)
    val bounds = base.agg(min(x).as("_gf_lo"), max(x).as("_gf_hi"))
    val baseCnt = base.filter(x.isNotNull).crossJoin(broadcast(bounds))
      .groupBy(psiBinId(x, bins).as("bin_id")).agg(count(lit(1)).as("base_cnt"))
    // null VALUES don't count toward the distribution, but their PERIOD
    // must still surface (an all-null month is an outage the dashboard
    // exists to show, as (period, 0, null) — not an omitted row): null x
    // gets a null bin, which the grid join below ignores while the
    // period still seeds `periods`.
    val tgtCnt = target.filter(col(periodCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .groupBy(col(periodCol).as("period"),
        when(x.isNotNull, psiBinId(x, bins)).as("bin_id"))
      .agg(count(x).as("target_cnt"))
    // every (period, bin) cell, so empty bins contribute their epsilon
    // term exactly as in psi(); periods frame is ≤periods rows
    val periods = tgtCnt.select("period").distinct()
    val allBins = base.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin_id"))
    val perPeriod = org.apache.spark.sql.expressions.Window.partitionBy("period")
    val cells = periods.crossJoin(allBins)
      .join(tgtCnt, Seq("period", "bin_id"), "left")
      .join(broadcast(baseCnt), Seq("bin_id"), "left")
      .withColumn("base_cnt", coalesce(col("base_cnt"), lit(0L)))
      .withColumn("target_cnt", coalesce(col("target_cnt"), lit(0L)))
      // base total = window sum of the per-bin counts (every non-null
      // base row lands in exactly one clamped bin) — no third base scan
      .withColumn("bp", when(sum("base_cnt").over(perPeriod) > 0,
        col("base_cnt").cast(DoubleType)
          / sum("base_cnt").over(perPeriod).cast(DoubleType)))
      // the >0 guard keeps an all-null period's 0/0 as null (an ANSI
      // decimal cast of the NaN it would otherwise produce throws)
      .withColumn("tp", when(sum("target_cnt").over(perPeriod) > 0,
        col("target_cnt").cast(DoubleType)
          / sum("target_cnt").over(perPeriod).cast(DoubleType)))
      .withColumn("psi_term", psiTerm(col("bp"), col("tp")))
    cells.groupBy("period")
      .agg(
        sum("target_cnt").as("n_target"),
        when(sum(col("base_cnt")) > 0 && sum(col("target_cnt")) > 0,
          sum(col("psi_term").cast(DecimalType(38, 6))).cast(DoubleType))
          .as("psi_total"))
      .orderBy("period")
  }

  /** Per-period bounded-divergence time series: one [[divergences]]-style
    * (JS, Hellinger, TV) total per PERIOD of the target against the fixed
    * base reference — the drift-dashboard family closed symmetrically
    * (PSI has [[psiByPeriod]], KS/CvM have their per-period forms; this
    * gives the ε-free bounded pack the same axis). Bins come from the
    * BASE bounds so every period scores on the same grid.
    *
    * Scale: identical to [[psiByPeriod]] — one 1-row bounds pass, one
    * ≤bins base aggregate, one ≤periods×bins target aggregate (map-side
    * combined); totals are per-period decimal sums of 6dp-rounded terms
    * over the cell frame. All-null periods surface as (period, 0, null…)
    * rather than dropping. */
  def divergencesByPeriod(base: DataFrame, target: DataFrame, column: String,
                          periodCol: String, bins: Int = 10): DataFrame = {
    require(bins > 0, s"divergencesByPeriod needs bins > 0, got $bins")
    val x = col(column).cast(DoubleType)
    val bounds = base.agg(min(x).as("_gf_lo"), max(x).as("_gf_hi"))
    val baseCnt = base.filter(x.isNotNull).crossJoin(broadcast(bounds))
      .groupBy(psiBinId(x, bins).as("bin_id")).agg(count(lit(1)).as("base_cnt"))
    val tgtCnt = target.filter(col(periodCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .groupBy(col(periodCol).as("period"),
        when(x.isNotNull, psiBinId(x, bins)).as("bin_id"))
      .agg(count(x).as("target_cnt"))
    val periods = tgtCnt.select("period").distinct()
    val allBins = base.sparkSession.range(bins.toLong)
      .select(col("id").cast("int").as("bin_id"))
    val perPeriod = org.apache.spark.sql.expressions.Window.partitionBy("period")
    val p = col("bp"); val q = col("tp")
    val m = (p + q) / lit(2.0)
    val jsTerm = graft.Num.dround(
      lit(0.5) * when(p > 0, p * log(p / m)).otherwise(lit(0.0)) +
        lit(0.5) * when(q > 0, q * log(q / m)).otherwise(lit(0.0)), 6)
    val hellTerm = graft.Num.dround(
      (sqrt(p) - sqrt(q)) * (sqrt(p) - sqrt(q)), 6)
    val tvTerm = graft.Num.dround(lit(0.5) * abs(p - q), 6)
    val cells = periods.crossJoin(allBins)
      .join(tgtCnt, Seq("period", "bin_id"), "left")
      .join(broadcast(baseCnt), Seq("bin_id"), "left")
      .withColumn("base_cnt", coalesce(col("base_cnt"), lit(0L)))
      .withColumn("target_cnt", coalesce(col("target_cnt"), lit(0L)))
      .withColumn("bp", when(sum("base_cnt").over(perPeriod) > 0,
        col("base_cnt").cast(DoubleType)
          / sum("base_cnt").over(perPeriod).cast(DoubleType)))
      .withColumn("tp", when(sum("target_cnt").over(perPeriod) > 0,
        col("target_cnt").cast(DoubleType)
          / sum("target_cnt").over(perPeriod).cast(DoubleType)))
      .withColumn("js_term", jsTerm)
      .withColumn("hell_term", hellTerm)
      .withColumn("tv_term", tvTerm)
    def decTotal(c: String): Column =
      sum(col(c).cast(DecimalType(38, 6))).cast(DoubleType)
    val bothSides = sum(col("base_cnt")) > 0 && sum(col("target_cnt")) > 0
    cells.groupBy("period")
      .agg(
        sum("target_cnt").as("n_target"),
        when(bothSides, decTotal("js_term")).as("js_div"),
        when(bothSides,
          graft.Num.dround(sqrt(lit(0.5) * decTotal("hell_term")), 6))
          .as("hellinger"),
        when(bothSides, decTotal("tv_term")).as("tv_dist"))
      .orderBy("period")
  }

  /** Freeze a PSI reference from a batch baseline: (lo, hi, per-bin
    * proportions). This is the dimension-sized snapshot a STREAMING drift
    * monitor carries — the baseline frame itself never rides the stream;
    * only `bins` doubles do. Raises on an empty/all-null baseline (a
    * reference that matches nothing is a config error, not "no drift"). */
  def psiReference(base: DataFrame, column: String,
                   bins: Int = 10): (Double, Double, Seq[Double]) = {
    require(bins > 0, s"psiReference needs bins > 0, got $bins")
    val x = col(column).cast(DoubleType)
    val bounds = base.agg(min(x).as("_gf_lo"), max(x).as("_gf_hi")).collect()(0)
    if (bounds.isNullAt(0)) throw new IllegalArgumentException(
      s"psiReference: baseline has no non-null rows in '$column'")
    val lo = bounds.getDouble(0); val hi = bounds.getDouble(1)
    // bin with the SAME literal arithmetic psiByWindow applies to the
    // stream (not the bounds-frame flavor) so reference and monitor agree
    // bit-for-bit on edge values
    val width = (hi - lo) / bins
    val binId: Column =
      if (width > 0)
        least(lit((bins - 1).toDouble),
          greatest(lit(0.0), floor((x - lit(lo)) / lit(width)))).cast("int")
      else lit(0)
    val counts = base.filter(x.isNotNull)
      .groupBy(binId.as("bin_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    (lo, hi, (0 until bins).map(i => counts.getOrElse(i, 0L).toDouble / total))
  }

  /** Per-event-time-window PSI against a frozen reference — the live
    * drift monitor: runs identically on a batch frame and a Structured
    * Streaming frame (same dual-mode contract as
    * [[graft.streaming.StreamOps.windowedAgg]] — `window()` + the
    * watermark hook), emitting one (window, n, psi_total) row per closed
    * window in Append mode.
    *
    * Stream-first shape: the reference is `bins` literal doubles baked
    * into the plan (from [[psiReference]]) so the stream side needs NO
    * join at all; the per-window histogram is ONE stateful aggregation
    * with `bins` conditional counters (state = windows × bins longs,
    * watermark-expired), and the PSI arithmetic is a stateless projection
    * over the counter columns — terms 6-dp-rounded then summed as exact
    * decimals, the [[psi]] discipline, in static bin order (no
    * reduction-order ambiguity). Null values don't count toward the
    * distribution, matching [[psi]]; a window only exists once it has a
    * non-null row, so the per-window total is never zero. */
  def psiByWindow(events: DataFrame, tsCol: String, column: String,
                  refLo: Double, refHi: Double, refProps: Seq[Double],
                  windowDur: String = "1 day",
                  delay: String = "2 hours"): DataFrame = {
    val bins = refProps.length
    require(bins > 0, "psiByWindow needs a non-empty reference")
    require(refHi >= refLo, s"psiByWindow: hi=$refHi < lo=$refLo")
    val x = col(column).cast(DoubleType)
    val width = (refHi - refLo) / bins
    val binId: Column =
      if (width > 0)
        least(lit((bins - 1).toDouble),
          greatest(lit(0.0), floor((x - lit(refLo)) / lit(width)))).cast("int")
      else lit(0)
    val src = graft.streaming.StreamOps.withWatermark(events, tsCol, delay)
    val counters = (0 until bins).map(i =>
      count(when(binId === i, 1)).as(s"_gf_c$i"))
    val agged = src.filter(x.isNotNull)
      .groupBy(window(col(tsCol), windowDur).as("_gf_w"))
      .agg(counters.head, counters.tail: _*)
      .withColumn("_gf_n", (0 until bins).map(i => col(s"_gf_c$i")).reduce(_ + _))
    val terms = (0 until bins).map { i =>
      val tp = col(s"_gf_c$i").cast(DoubleType) / col("_gf_n").cast(DoubleType)
      psiTerm(lit(refProps(i)), tp)
    }
    agged.select(
      col("_gf_w.start").as("window_start"),
      col("_gf_w.end").as("window_end"),
      col("_gf_n").as("n"),
      terms.map(_.cast(DecimalType(38, 6))).reduce(_ + _)
        .cast(DoubleType).as("psi_total"))
  }

  /** Two-sample Kolmogorov-Smirnov statistic: max |F_base(x) - F_target(x)|
    * over the pooled support. Nonparametric companion to [[psi]] — no
    * binning choice, sensitive to any distributional difference.
    *
    * Shape: each side pre-aggregates to (value, count) — the only row-level
    * shuffle is on the value key with map-side combine — then one cumulative
    * window over the DISTINCT pooled values computes both CDFs. The window
    * is single-partition over distinct values: exact KS is inherently a
    * sorted scan of the support, so for 100 TB columns with unbounded
    * cardinality pass `quantize > 0` — both sides bucket into `quantize`
    * equal-width bins over the POOLED range (one extra 1-row bounds pass
    * per side) before counting, bounding the window's input to `quantize`
    * rows. Counts stay exact; the CDF — and so the KS statistic — moves by
    * at most one bucket's probability mass. `quantize = 0` (default) is
    * the exact oracle path. */
  def ks(base: DataFrame, target: DataFrame, column: String,
         quantize: Int = 0): DataFrame = {
    val x = col(column).cast(DoubleType)
    def side(df: DataFrame): DataFrame =
      if (quantize <= 0) df.filter(x.isNotNull).select(x.as("v"))
      else {
        // pooled bounds so both sides share bin edges (least/greatest skip
        // a side that is empty/all-null)
        val bounds = broadcast(
          base.filter(x.isNotNull).agg(min(x).as("_gf_l1"), max(x).as("_gf_h1"))
            .crossJoin(target.filter(x.isNotNull)
              .agg(min(x).as("_gf_l2"), max(x).as("_gf_h2")))
            .select(least(col("_gf_l1"), col("_gf_l2")).as("_gf_lo"),
              greatest(col("_gf_h1"), col("_gf_h2")).as("_gf_hi")))
        df.filter(x.isNotNull).crossJoin(bounds)
          .select(graft.profile.Distributions
            .quantizeExpr(x, col("_gf_lo"), col("_gf_hi"), quantize).as("v"))
      }
    pooledCdf(side(base), side(target))
      .agg(max(abs(col("cb") - col("ct"))).as("d"))
      .select(lit(column).as("column_name"),
        graft.Num.dround(col("d"), 6).as("ks_stat"))
  }

  /** Shared pooled-CDF frame over two pre-projected single-column (`v`)
    * sides: (v, bc, tc, cb, ct, nb, nt) — distinct pooled values with
    * both cumulative CDFs and the side totals. One-sided-empty guard:
    * 0/0 would make a CDF NaN, and NaN flows through max/dround into a
    * silent never-true comparison downstream — null instead. */
  private def pooledCdf(bSide: DataFrame, tSide: DataFrame): DataFrame = {
    val b = bSide.groupBy("v").agg(count(lit(1)).as("bc"))
    val t = tSide.groupBy("v").agg(count(lit(1)).as("tc"))
    val merged = b.join(t, Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("bc"), lit(0L)).as("bc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("v").rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    merged
      .withColumn("nb", sum("bc").over(tot))
      .withColumn("nt", sum("tc").over(tot))
      .withColumn("cb",
        when(col("nb") > 0, sum("bc").over(w).cast(DoubleType) / col("nb")))
      .withColumn("ct",
        when(col("nt") > 0, sum("tc").over(w).cast(DoubleType) / col("nt")))
  }

  /** Two-sample Cramér–von Mises statistic (discrete, pooled-mass form):
    * T = (n_b·n_t / (n_b+n_t)²) · Σ_k (F_b(v_k) − F_t(v_k))² · p_k with
    * p_k the pooled probability mass at v_k — the BODY-weighted companion
    * of [[ks]]: KS sees only the single worst point, CvM integrates the
    * squared CDF gap over the whole support, so a broad small shift that
    * never produces one large gap still registers. Same exact pooled
    * (value, count) machinery and `quantize` bound as [[ks]]; per-value
    * terms dround to 12dp and accumulate as exact DECIMAL(38,12) (the
    * dsum rule), so the oracle replays the statistic to the digit.
    * Output: (column_name, n_base, n_target, cvm_stat 6dp). */
  def cvm(base: DataFrame, target: DataFrame, column: String,
          quantize: Int = 0): DataFrame = {
    val x = col(column).cast(DoubleType)
    def side(df: DataFrame): DataFrame =
      if (quantize <= 0) df.filter(x.isNotNull).select(x.as("v"))
      else {
        val bounds = broadcast(
          base.filter(x.isNotNull).agg(min(x).as("_gf_l1"), max(x).as("_gf_h1"))
            .crossJoin(target.filter(x.isNotNull)
              .agg(min(x).as("_gf_l2"), max(x).as("_gf_h2")))
            .select(least(col("_gf_l1"), col("_gf_l2")).as("_gf_lo"),
              greatest(col("_gf_h1"), col("_gf_h2")).as("_gf_hi")))
        df.filter(x.isNotNull).crossJoin(bounds)
          .select(graft.profile.Distributions
            .quantizeExpr(x, col("_gf_lo"), col("_gf_hi"), quantize).as("v"))
      }
    val cdf = pooledCdf(side(base), side(target))
    val pk = (col("bc") + col("tc")).cast(DoubleType) /
      (col("nb") + col("nt")).cast(DoubleType)
    val term = graft.Num.dround(
      (col("cb") - col("ct")) * (col("cb") - col("ct")) * pk, 12)
    cdf.agg(
        max(col("nb")).as("n_base"), max(col("nt")).as("n_target"),
        round(sum(term.cast(org.apache.spark.sql.types.DecimalType(38, 12))), 8)
          .cast(DoubleType).as("_s"))
      .select(lit(column).as("column_name"),
        col("n_base"), col("n_target"),
        when(col("n_base") > 0 && col("n_target") > 0, graft.Num.dround(
          col("n_base").cast(DoubleType) * col("n_target").cast(DoubleType) /
            ((col("n_base") + col("n_target")).cast(DoubleType) *
             (col("n_base") + col("n_target")).cast(DoubleType)) * col("_s"), 6))
          .as("cvm_stat"))
  }

  /** Per-period two-sample Cramér–von Mises against a fixed base — the
    * [[psiByPeriod]] treatment for [[cvm]]: every period in the target is
    * scored against the SAME base reference, so the sequential monitors
    * (CUSUM, PSI-by-period) and the distributional ones share the
    * dashboard shape (period, n, stat). `periodCol` must be a non-null
    * integral target column derived upstream (e.g. `year*100+month`).
    *
    * Shape: base collapses once to its (value, count) histogram
    * (≤ |domain| rows); the target to (period, value, count); the grid
    * is periods × base-histogram (broadcast — the base histogram is
    * dimension-sized) full-outer-merged with the target cells, and the
    * CDF window runs per period over ≤ |pooled domain| rows — the corpus
    * itself never sorts and never re-scans per period. For unbounded-
    * cardinality columns at 100 TB pass `quantize > 0`: both sides bucket
    * into equal-width bins over the POOLED global range first (the [[ks]]
    * bound), capping every per-period window at `quantize` rows.
    *
    * Output: (period, n_base, n_target, cvm_stat 6dp), one row per target
    * period; stat is null for a period with no mass on either side. */
  def cvmByPeriod(base: DataFrame, target: DataFrame, column: String,
                  periodCol: String, quantize: Int = 0): DataFrame = {
    val cdf = perPeriodCdf(base, target, column, periodCol, quantize)
    val pk = (col("bc") + col("tc")).cast(DoubleType) /
      (col("nb") + col("nt")).cast(DoubleType)
    val term = graft.Num.dround(
      (col("cb") - col("ct")) * (col("cb") - col("ct")) * pk, 12)
    cdf.groupBy("period")
      .agg(
        max(col("nb")).as("n_base"), max(col("nt")).as("n_target"),
        round(sum(term.cast(org.apache.spark.sql.types.DecimalType(38, 12))), 8)
          .cast(DoubleType).as("_s"))
      .select(col("period"), col("n_base"), col("n_target"),
        when(col("n_base") > 0 && col("n_target") > 0, graft.Num.dround(
          col("n_base").cast(DoubleType) * col("n_target").cast(DoubleType) /
            ((col("n_base") + col("n_target")).cast(DoubleType) *
             (col("n_base") + col("n_target")).cast(DoubleType)) * col("_s"), 6))
          .as("cvm_stat"))
      .orderBy("period")
  }

  /** Per-period KS against a fixed base — [[ks]] in [[cvmByPeriod]]'s
    * dashboard shape, off the SAME shared per-period CDF frame: the
    * third column of the (period, n, stat) drift dashboard. Output
    * (period, n_base, n_target, ks_stat 6dp). */
  def ksByPeriod(base: DataFrame, target: DataFrame, column: String,
                 periodCol: String, quantize: Int = 0): DataFrame =
    perPeriodCdf(base, target, column, periodCol, quantize)
      .groupBy("period")
      .agg(max(col("nb")).as("n_base"), max(col("nt")).as("n_target"),
        max(abs(col("cb") - col("ct"))).as("_d"))
      .select(col("period"), col("n_base"), col("n_target"),
        when(col("n_base") > 0 && col("n_target") > 0,
          graft.Num.dround(col("_d"), 6)).as("ks_stat"))
      .orderBy("period")

  /** Per-period KS p-values + Benjamini–Hochberg FDR control — the
    * multiple-testing answer to "36 monthly KS stats, which are REAL?":
    * testing every period at α = 0.05 expects ~2 false alarms per
    * 40-period dashboard; BH caps the FALSE-DISCOVERY RATE at `q`
    * instead. Per period: the asymptotic two-sample KS p-value
    * p = 2 Σ_{k=1..terms} (−1)^{k−1} e^{−2k²λ²} at
    * λ = (√n_e + 0.12 + 0.11/√n_e)·D, n_e = n_b·n_t/(n_b+n_t) (the
    * Numerical-Recipes form), TRUNCATED at `terms` — the truncated sum
    * IS the pinned cross-engine semantic (both engines compute the same
    * 20 exp terms; the tail beyond is < e^{−800λ²}), clamped to [0, 1]
    * and 6dp-dround'd. Then BH over the period family: rank p ascending
    * (period tiebreak), reject all ranks ≤ max{i : p_(i) ≤ i·q/m}.
    * Output (period, n_base, n_target, ks_stat, p_value, reject).
    *
    * Scale: everything after [[perPeriodCdf]] is periods-sized; the BH
    * windows run over the period FAMILY (dozens of rows), never data. */
  def ksFdrByPeriod(base: DataFrame, target: DataFrame, column: String,
                    periodCol: String, q: Double = 0.05, terms: Int = 20,
                    quantize: Int = 0): DataFrame = {
    require(q > 0 && q < 1, s"FDR level q must be in (0, 1), got $q")
    require(terms >= 1, s"terms must be >= 1, got $terms")
    val ks = ksByPeriod(base, target, column, periodCol, quantize)
    val ne = col("n_base").cast(DoubleType) * col("n_target").cast(DoubleType) /
      (col("n_base") + col("n_target")).cast(DoubleType)
    val lam = (sqrt(ne) + lit(0.12) + lit(0.11) / sqrt(ne)) * col("ks_stat")
    val series = (1 to terms).map { k =>
      val sign = if (k % 2 == 1) 1.0 else -1.0
      lit(2.0 * sign) * exp(lit(-2.0 * k * k) * lam * lam)
    }.reduce(_ + _)
    // probks guard: below λ ≈ 0.3 the alternating series' terms decay
    // too slowly for a fixed truncation (at λ = 0 the 20-term partial
    // sum is literally 0, the OPPOSITE of the true p → 1 limit) — and
    // the true p-value there is 1 to well past 6dp, so return 1
    // exactly. The guard is part of the pinned semantic.
    val p = when(lam < lit(0.3), lit(1.0)).otherwise(graft.Num.dround(
      least(lit(1.0), greatest(lit(0.0), series)), 6))
    val withP = ks.withColumn("p_value",
      when(col("ks_stat").isNotNull, p))
    import org.apache.spark.sql.expressions.Window
    // NULLS LAST pinned explicitly: Spark defaults nulls-first ASC,
    // DuckDB nulls-last — an unpinned order would diverge the BH ranks
    val byP = Window.orderBy(col("p_value").asc_nulls_last, col("period"))
    val fam = Window.partitionBy(lit(1))
    val ranked = withP
      .withColumn("_i", row_number().over(byP))
      .withColumn("_m", count(lit(1)).over(fam))
      .withColumn("_ok", col("p_value") <=
        col("_i").cast(DoubleType) * lit(q) / col("_m").cast(DoubleType))
      .withColumn("_kmax", max(when(col("_ok"), col("_i"))).over(fam))
    ranked.select(col("period"), col("n_base"), col("n_target"),
        col("ks_stat"), col("p_value"),
        (col("_kmax").isNotNull && col("_i") <= col("_kmax")).as("reject"))
      .orderBy("period")
  }

  /** DuckDB fragment: the truncated KS p-value series over a `lam`
    * expression — the SAME `terms` exp terms the Spark side sums, each
    * constant Scala-rendered so both engines parse identical doubles. */
  def sqlKsPSeries(lam: String, terms: Int): String =
    (1 to terms).map { k =>
      val sign = if (k % 2 == 1) 2.0 else -2.0
      s"($sign) * exp((${-2.0 * k * k}) * $lam * $lam)"
    }.mkString(" + ")

  /** The shared per-period pooled-CDF frame under [[cvmByPeriod]] and
    * [[ksByPeriod]]: base collapses ONCE to its (value, count) histogram
    * and broadcasts onto every target period's support; one CDF window
    * per period over histogram-sized frames. Columns
    * (period, v, bc, tc, nb, nt, cb, ct). */
  private def perPeriodCdf(base: DataFrame, target: DataFrame,
                           column: String, periodCol: String,
                           quantize: Int): DataFrame = {
    val x = col(column).cast(DoubleType)
    def quantized(df: DataFrame, keep: Seq[Column]): DataFrame =
      if (quantize <= 0) df.filter(x.isNotNull).select(keep :+ x.as("v"): _*)
      else {
        val bounds = broadcast(
          base.filter(x.isNotNull).agg(min(x).as("_gf_l1"), max(x).as("_gf_h1"))
            .crossJoin(target.filter(x.isNotNull)
              .agg(min(x).as("_gf_l2"), max(x).as("_gf_h2")))
            .select(least(col("_gf_l1"), col("_gf_l2")).as("_gf_lo"),
              greatest(col("_gf_h1"), col("_gf_h2")).as("_gf_hi")))
        df.filter(x.isNotNull).crossJoin(bounds)
          .select(keep :+ graft.profile.Distributions
            .quantizeExpr(x, col("_gf_lo"), col("_gf_hi"), quantize).as("v"): _*)
      }
    val b = quantized(base, Nil).groupBy("v").agg(count(lit(1)).as("bc"))
    val t = quantized(target.filter(col(periodCol).isNotNull),
        Seq(col(periodCol).as("period")))
      .groupBy("period", "v").agg(count(lit(1)).as("tc"))
    val periods = t.select("period").distinct()
    // per-period pooled support: every base value in every period (the
    // shared reference grid) plus the period's own values
    val cells = periods.crossJoin(broadcast(b))
      .join(t, Seq("period", "v"), "full_outer")
      .select(col("period"), col("v"),
        coalesce(col("bc"), lit(0L)).as("bc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("period")
      .orderBy("v")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy("period")
    cells
      .withColumn("nb", sum("bc").over(tot))
      .withColumn("nt", sum("tc").over(tot))
      .withColumn("cb",
        when(col("nb") > 0, sum("bc").over(w).cast(DoubleType) / col("nb")))
      .withColumn("ct",
        when(col("nt") > 0, sum("tc").over(w).cast(DoubleType) / col("nt")))
  }
}
