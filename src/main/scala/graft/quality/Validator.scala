package graft.quality

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rule-based validation engine — Spark-native counterpart of the
  * reference's `m02_validation/validate_data.py` (run_validation_suite).
  *
  * Scale design: all RowRules fold into ONE aggregation pass (map-side
  * partial sums of violation indicators — bytes of state per partition, no
  * row shuffle). SchemaRules never touch data. UniqueKey rules each add one
  * keyed reduction. The suite result is a single lazily-unioned DataFrame.
  */
object Validator {

  private val summarySchema = StructType(Seq(
    StructField("rule", StringType, nullable = false),
    StructField("column_name", StringType, nullable = false),
    StructField("violation_count", LongType, nullable = false),
    StructField("passed", BooleanType, nullable = false)))

  /** Pass/fail summary per rule — reference's results dict
    * (validate_data.py:49-123) as a DataFrame: (rule, column_name,
    * violation_count, passed). Ordered by (rule, column_name). */
  def summary(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val spark = df.sparkSession
    val present = df.columns.toSet
    // Rules on absent columns are skipped, mirroring the reference's
    // `if col in df.columns` guards (validate_data.py:28,83,100) — schema
    // conformity is the rule that reports missing columns.
    val rowRules    = rules.collect { case r: RowRule if present(r.column) => r }
    val schemaRules = rules.collect { case r: SchemaRule => r }
    val keyRules    = rules.collect { case r: UniqueKey if r.columns.forall(present) => r }

    val parts = Seq.newBuilder[DataFrame]

    if (rowRules.nonEmpty) {
      val entries = rowRules.map { r =>
        struct(
          lit(r.ruleName).as("rule"),
          lit(r.column).as("column_name"),
          coalesce(sum(when(r.violation, 1L)), lit(0L)).as("violation_count"))
      }
      parts += df.agg(array(entries.toIndexedSeq: _*).as("m"))
        .select(explode(col("m")).as("e"))
        .select(col("e.rule"), col("e.column_name"), col("e.violation_count"),
          (col("e.violation_count") === 0L).as("passed"))
    }

    // Schema-level rules: resolved from df.schema, no scan.
    val schemaResults = schemaRules.map {
      case ExpectedColumns(cols) =>
        val actual = df.columns.toSet
        val missing = cols.filterNot(actual)
        val unexpected = df.columns.filterNot(cols.toSet)
        val bad = (missing.size + unexpected.size).toLong
        Row("schema_conformity", "*", bad, bad == 0L)
      case ExpectedType(c, t) =>
        // Absent column => vacuous pass (reference validate_data.py:83).
        val ok = df.schema.fields.find(_.name == c)
          .forall(_.dataType.simpleString == t)
        Row("dtype_enforcement", c, if (ok) 0L else 1L, ok)
    }
    if (schemaResults.nonEmpty)
      parts += spark.createDataFrame(
        spark.sparkContext.parallelize(schemaResults, 1), summarySchema)

    keyRules.foreach { r =>
      val cols = r.columns.map(col)
      parts += df.groupBy(cols: _*).agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(when(col("cnt") > 1, col("cnt"))), lit(0L))
          .as("violation_count"))
        .select(
          lit("unique_key").as("rule"),
          lit(r.columns.mkString(",")).as("column_name"),
          col("violation_count"),
          (col("violation_count") === 0L).as("passed"))
    }

    parts.result()
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], summarySchema))
      .orderBy("rule", "column_name")
  }

  /** Per-row OR of all row-rule violations. */
  private def anyViolation(rowRules: Seq[RowRule]): Column =
    rowRules.map(_.violation).reduceOption(_ || _).getOrElse(lit(false))

  /** Row-coverage % — share of rows violating no row-level rule
    * (validate_data.py:110-123). Single aggregation pass. */
  def rowCoverage(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val present = df.columns.toSet
    val rowRules = rules.collect { case r: RowRule if present(r.column) => r }
    df.agg(
      count(lit(1)).as("total_rows"),
      coalesce(sum(when(anyViolation(rowRules), 1L)), lit(0L)).as("failing_rows"))
      .select(col("total_rows"), col("failing_rows"),
        graft.Num.dround((col("total_rows") - col("failing_rows")).cast(DoubleType) /
          col("total_rows") * 100, 2).as("coverage_pct"))
  }

  /** Violating rows with the list of failed rules attached — reference's
    * `violating_rows` details, plus an explicit audit column. Filter is
    * pushed to the scan; output order is the caller's concern. */
  def violations(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val present = df.columns.toSet
    val rowRules = rules.collect { case r: RowRule if present(r.column) => r }
    val tags = rowRules.map(r => when(r.violation, lit(s"${r.ruleName}:${r.column}")))
    df.withColumn("failed_rules",
        filter(array(tags.toIndexedSeq: _*), c => c.isNotNull))
      .filter(size(col("failed_rules")) > 0)
  }

  /** Unique invalid values + counts for a whitelist rule — reference's
    * `invalid_value_summary` (validate_data.py:33-40). */
  def invalidValueSummary(df: DataFrame, rule: InSet): DataFrame =
    df.filter(rule.violation)
      .groupBy(col(rule.column).as("invalid_value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("invalid_value"))

  /** Referential-integrity audit: foreign-key values in `fact` with no
    * match in `dim`, with how many rows each orphan strands — the
    * cross-TABLE rule the single-frame Rule set can't express. Null FKs
    * are a different defect (NotNull's) and are excluded here. Scale
    * shape: the dim side collapses to DISTINCT keys before the anti-join
    * (dimension-sized — broadcastable; beyond that, a sort-merge
    * anti-join on the key); the report is one map-side-combined count
    * per orphan value. */
  def orphans(fact: DataFrame, fkCol: String,
              dim: DataFrame, pkCol: String): DataFrame =
    fact.filter(col(fkCol).isNotNull)
      .join(dim.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .groupBy(col(fkCol).as("orphan_key"))
      .agg(count(lit(1)).as("n_rows"))

  /** Functional-dependency audit: determinant values for which
    * `detCol → depCol` does NOT hold (more than one distinct dependent),
    * with the dependent cardinality and the row mass involved — the
    * "is this column really derivable from that one" check behind
    * normalization and join-key decisions. One grouped pass keyed on the
    * determinant (count-distinct expands map-side; ≤ |determinants| rows
    * ever shuffle). */
  def fdViolations(df: DataFrame, detCol: String, depCol: String): DataFrame =
    df.filter(col(detCol).isNotNull)
      .groupBy(col(detCol).as("determinant"))
      .agg(countDistinct(col(depCol)).as("n_dependents"),
        count(lit(1)).as("n_rows"))
      .filter(col("n_dependents") > 1)
}
