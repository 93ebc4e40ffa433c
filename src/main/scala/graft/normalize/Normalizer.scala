package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Fuzzy-correction spec for one column: correct values not in `masterList`
  * to their best master match when the similarity score clears `cutoff`
  * (reference normalize_data.py:72-103, thefuzz-based). The public-analog
  * score used here is `100 * (1 - levenshtein/max(len))`, taken as the max
  * of the raw strings and their token-sorted forms (`tokenSort=true`,
  * default) — thefuzz's WRatio is token-aware, so "smith john" must match
  * "john smith"; plain Levenshtein scores that reordering near 0.
  * `partialRatio=true` adds WRatio's substring tier: when the lengths
  * differ by ≥1.5× the max also considers 0.9 × the best window ratio
  * ([[Normalizer.partialScore]]), so "acme corp" matches
  * "acme corporation ltd" — substring containment that both the plain and
  * token-sorted forms score far below cutoff. */
final case class FuzzySpec(masterList: Seq[String], cutoff: Double = 90.0,
                           tokenSort: Boolean = true,
                           partialRatio: Boolean = false)

/** Config for a normalization pass — the typed form of the reference's
  * `normalization` YAML block (normalize_data.py:20-282), applied in the
  * same fail-safe order: rename → standardize text → map values → fuzzy →
  * parse datetimes → coerce dtypes. */
final case class NormalizeConfig(
    renameColumns: Map[String, String] = Map.empty,
    standardizeTextColumns: Seq[String] = Nil,
    /** Per column: exact value -> replacement; key "null" maps SQL NULLs
      * (reference's `np.nan` sentinel, normalize_data.py:61-63). */
    valueMappings: Map[String, Map[String, String]] = Map.empty,
    fuzzyMatching: Map[String, FuzzySpec] = Map.empty,
    /** Per column: datetime formats tried in order (Spark patterns);
      * empty list = engine inference. Unparsable -> NULL ('coerce'). */
    parseDatetimes: Map[String, Seq[String]] = Map.empty,
    /** Per column: target Spark type; failed coercion -> NULL (try_cast),
      * mirroring the reference's pd.to_numeric fail-safe. */
    coerceTypes: Map[String, String] = Map.empty)

/** Spark-native counterpart of `m03_normalization/normalize_data.py`.
  *
  * All steps are pure column expressions (codegen'd, zero shuffles) except
  * fuzzy correction, which reduces to: distinct values (keyed reduction) ×
  * broadcast master list → best match per value (window over the tiny
  * distinct set) → broadcast-joined back. At 100 TB the data never
  * shuffles; only the distinct value set does.
  */
object Normalizer {

  /** Apply all configured steps in the reference's order; returns the
    * normalized frame and a changelog DataFrame (step, column, detail). */
  def apply(df: DataFrame, config: NormalizeConfig): (DataFrame, DataFrame) = {
    val log = Seq.newBuilder[(String, String, String)]

    var out = df
    if (config.renameColumns.nonEmpty) {
      val valid = config.renameColumns.filter { case (from, _) => out.columns.contains(from) }
      out = out.withColumnsRenamed(valid)
      valid.foreach { case (f, t) => log += (("rename_columns", f, s"-> $t")) }
    }

    config.standardizeTextColumns.filter(out.columns.contains).foreach { c =>
      out = out.withColumn(c, standardizeText(col(c)))
      log += (("standardize_text", c, "trim+lower"))
    }

    config.valueMappings.foreach { case (c, mapping) =>
      if (out.columns.contains(c)) {
        out = out.withColumn(c, mapValuesExpr(col(c), mapping))
        log += (("map_values", c, s"${mapping.size} mappings"))
      }
    }

    config.fuzzyMatching.foreach { case (c, spec) =>
      if (out.columns.contains(c)) {
        out = fuzzyCorrect(out, c, spec)
        log += (("fuzzy_match", c, s"master=${spec.masterList.size} cutoff=${spec.cutoff}"))
      }
    }

    config.parseDatetimes.foreach { case (c, formats) =>
      if (out.columns.contains(c)) {
        out = out.withColumn(c, parseDatetimeExpr(col(c), formats))
        log += (("parse_datetimes", c, if (formats.isEmpty) "infer" else formats.mkString("|")))
      }
    }

    config.coerceTypes.foreach { case (c, t) =>
      if (out.columns.contains(c)) {
        out = out.withColumn(c, out.col(c).try_cast(t))
        log += (("coerce_dtypes", c, s"-> $t"))
      }
    }

    val changelog = df.sparkSession
      .createDataFrame(log.result()).toDF("step", "column_name", "detail")
    (out, changelog)
  }

  /** Trim + lowercase, null-preserving (normalize_data.py:15-18). */
  def standardizeText(c: Column): Column = lower(trim(c))

  /** Exact-value replacement incl. the "null" sentinel
    * (normalize_data.py:55-69). Unmapped values pass through. */
  def mapValuesExpr(c: Column, mapping: Map[String, String]): Column = {
    val base: Column = mapping.get("null") match {
      case Some(v) => when(c.isNull, lit(v))
      case None    => when(lit(false), lit(null))
    }
    val chained = mapping.view.filterKeys(_ != "null").foldLeft(base) {
      case (acc, (from, to)) => acc.when(c === lit(from), lit(to))
    }
    chained.otherwise(c)
  }

  /** Multi-format datetime parse with 'coerce' semantics: first format that
    * parses wins, unparsable -> NULL (normalize_data.py:105-230). */
  def parseDatetimeExpr(c: Column, formats: Seq[String]): Column =
    if (formats.isEmpty) try_to_timestamp(c)
    else coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*)

  /** Correct off-list values to their closest master entry. See class doc
    * for the distributed shape. Deterministic best match: highest score,
    * then lexicographic master value. */
  /** Tokens sorted lexicographically and re-joined — makes the score
    * invariant to word order. */
  def tokenSorted(c: Column): Column =
    concat_ws(" ", sort_array(split(trim(c), "\\s+")))

  /** thefuzz partial_ratio analogue (normalize_data.py:93, WRatio's
    * substring tier): the best plain ratio of the SHORTER string against
    * every same-length substring window of the longer. Runs only over the
    * distinct-values × master-list frame, so the window scan cost never
    * touches raw rows. */
  def partialScore(a: Column, b: Column): Column = {
    val s = when(length(a) <= length(b), a).otherwise(b)
    val l = when(length(a) <= length(b), b).otherwise(a)
    val m = length(s)
    when(m === 0, lit(0.0)).otherwise(
      array_max(transform(
        sequence(lit(1), length(l) - m + lit(1)),
        i => lit(100.0) * (lit(1.0) -
          levenshtein(s, l.substr(i, m)).cast(DoubleType) / m.cast(DoubleType)))))
  }

  def fuzzyCorrect(df: DataFrame, column: String, spec: FuzzySpec): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val master = spec.masterList.toDF("_gf_master")
    val values = df.select(col(column).as("_gf_val")).distinct()
      .filter(col("_gf_val").isNotNull && !col("_gf_val").isin(spec.masterList: _*))
    def rawScore(a: Column, b: Column): Column = lit(100.0) * (lit(1.0) -
      levenshtein(a, b).cast(DoubleType) /
        greatest(length(a), length(b)).cast(DoubleType))
    val plain = rawScore(col("_gf_val"), col("_gf_master"))
    val base =
      if (spec.tokenSort)
        greatest(plain, rawScore(tokenSorted(col("_gf_val")), tokenSorted(col("_gf_master"))))
      else plain
    val score =
      if (spec.partialRatio) {
        // WRatio applies the substring tier only to length-mismatched
        // pairs (≥1.5× — multiplication form avoids a 0-length division)
        // and weights it by 0.9
        val la = length(col("_gf_val")).cast(DoubleType)
        val lb = length(col("_gf_master")).cast(DoubleType)
        val gate = greatest(la, lb) >= lit(1.5) * least(la, lb)
        greatest(base, when(gate,
          lit(0.9) * partialScore(col("_gf_val"), col("_gf_master")))
          .otherwise(lit(0.0)))
      } else base
    val w = Window.partitionBy("_gf_val")
      .orderBy(col("_gf_score").desc, col("_gf_master"))
    val best = values.crossJoin(broadcast(master))
      .withColumn("_gf_score", score)
      .withColumn("_gf_rn", row_number().over(w))
      .filter(col("_gf_rn") === 1 && col("_gf_score") >= spec.cutoff)
      .select("_gf_val", "_gf_master")
    df.join(broadcast(best), df(column) === best("_gf_val"), "left")
      .withColumn(column, coalesce(col("_gf_master"), col(column)))
      .drop("_gf_val", "_gf_master")
  }
}
