package graft.audit

import graft.quality.{Rule, Validator}
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Final edits config (final_audit_producer.py:28-77). */
final case class FinalEditsConfig(
    dropColumns: Seq[String] = Nil,
    renameColumns: Map[String, String] = Map.empty,
    coerceTypes: Map[String, String] = Map.empty)

/** Final audit / certification — Spark-native counterpart of the
  * reference's `m10_final_audit/final_audit_producer.py`: last-mile edits,
  * a strict re-validation pass, and a dedicated null audit.
  */
object FinalAudit {

  /** Drop/rename/coerce; missing columns are skipped with a log entry,
    * coercion failures null out (try_cast) rather than abort. */
  def applyEdits(df: DataFrame, cfg: FinalEditsConfig): (DataFrame, DataFrame) = {
    val log = Seq.newBuilder[(String, String)]
    var out = df
    val dropping = cfg.dropColumns.filter(out.columns.contains)
    if (dropping.nonEmpty) {
      out = out.drop(dropping: _*)
      log += (("drop_columns", dropping.mkString(",")))
    }
    val renames = cfg.renameColumns.filter { case (f, _) => out.columns.contains(f) }
    if (renames.nonEmpty) {
      out = out.withColumnsRenamed(renames)
      log += (("rename_columns", renames.map { case (f, t) => s"$f->$t" }.mkString(",")))
    }
    cfg.coerceTypes.foreach { case (c, t) =>
      if (out.columns.contains(c)) {
        out = out.withColumn(c, out.col(c).try_cast(t))
        log += (("coerce_dtypes", s"$c->$t"))
      }
    }
    val changelog = df.sparkSession.createDataFrame(log.result())
      .toDF("action", "details")
    (out, changelog)
  }

  /** Strict certification = the validation suite on the edited frame
    * (final_audit_producer.py:113-117). */
  def certify(df: DataFrame, rules: Seq[Rule]): DataFrame =
    Validator.summary(df, rules)

  /** Null audit on required columns (final_audit_producer.py:80-92):
    * one pass, every column reported (passed=true rows included so the
    * result is a complete audit artifact, not only failures). */
  def nullAudit(df: DataFrame, disallowed: Seq[String]): DataFrame = {
    val cols = disallowed.filter(df.columns.contains)
    val entries = cols.map { c =>
      struct(lit(c).as("column_name"),
        (count(lit(1)) - count(col(c))).cast(LongType).as("null_count"))
    }
    df.agg(array(entries.toIndexedSeq: _*).as("m"))
      .select(explode(col("m")).as("e"))
      .select(col("e.column_name"), col("e.null_count"),
        (col("e.null_count") === 0L).as("passed"))
      .orderBy("column_name")
  }
}

/** 0-100 weighted "data health score" — reference `m00_utils/scoring.py`.
  * Weights: completeness .40, validity .30, uniqueness .15,
  * consistency .15; green >= 90, yellow >= 70, red below. */
object HealthScore {
  val weights: Map[String, Double] = Map(
    "completeness" -> 0.40, "validity" -> 0.30,
    "uniqueness" -> 0.15, "consistency" -> 0.15)

  /** Score from the four ratios (all 0-1, higher = worse except passRate).
    * Pure column arithmetic so it composes into any plan. */
  def scoreColumns(nullRate: Column, validationPassRate: Column,
                   dupRatio: Column, outlierRatio: Column): Seq[Column] = {
    val comp    = (lit(1.0) - nullRate) * 100
    val valid   = validationPassRate * 100
    val unique  = (lit(1.0) - dupRatio) * 100
    val consist = (lit(1.0) - outlierRatio) * 100
    val total = comp * weights("completeness") + valid * weights("validity") +
      unique * weights("uniqueness") + consist * weights("consistency")
    val r1 = (c: Column) => graft.Num.dround(c, 1)
    Seq(
      r1(total).as("overall_score"),
      when(r1(total) < 70, "red").when(r1(total) < 90, "yellow")
        .otherwise("green").as("status"),
      r1(comp).as("completeness"),
      r1(valid).as("validity"),
      r1(unique).as("uniqueness"),
      r1(consist).as("consistency"))
  }

  /** End-to-end score for a frame: null rate over the given columns,
    * row-coverage as validity, duplicate ratio over `dupSubset`, outlier
    * ratio from pre-computed outlier flags count. All inputs are 1-row
    * aggregates crossJoined together — a few scans, zero row shuffles
    * beyond the dup-subset reduction. */
  def compute(df: DataFrame, nullCols: Seq[String], rules: Seq[graft.quality.Rule],
              dupSubset: Seq[String], outlierFlagged: DataFrame): DataFrame = {
    val cells = nullCols.map(c => (count(lit(1)) - count(col(c))).cast(DoubleType))
      .reduce(_ + _)
    val nullRate = df.agg(
      (cells / (count(lit(1)) * nullCols.size)).as("null_rate"))
    val coverage = Validator.rowCoverage(df, rules)
      .select(((col("total_rows") - col("failing_rows")).cast(DoubleType) /
        col("total_rows")).as("pass_rate"))
    val dup = graft.profile.Profiler.duplicateSummary(df, dupSubset)
      .select((col("duplicate_pct") / 100.0).as("dup_ratio"))
    val outliers = outlierFlagged.agg(
      (coalesce(sum(when(col("any_outlier"), 1L)), lit(0L)).cast(DoubleType) /
        count(lit(1))).as("outlier_ratio"))
    nullRate.crossJoin(coverage).crossJoin(dup).crossJoin(outliers)
      .select(scoreColumns(col("null_rate"), col("pass_rate"),
        col("dup_ratio"), col("outlier_ratio")): _*)
  }
}
