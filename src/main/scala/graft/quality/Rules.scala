package graft.quality

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed validation rules — the Spark-native form of the reference's YAML
  * `schema_validation.rules` blocks (validate_data.py:49-107 and
  * final_audit_producer.py:80-92). A rule is either:
  *  - a RowRule: evaluated as a per-row violation predicate, so a whole
  *    suite reduces to ONE aggregation pass over the data;
  *  - a SchemaRule: evaluated against `df.schema` only (no scan at all);
  *  - UniqueKey: needs its own keyed reduction (group-count on the key).
  */
sealed trait Rule { def ruleName: String }

sealed trait RowRule extends Rule {
  def column: String
  /** True on rows that VIOLATE the rule. Null handling mirrors the
    * reference: set/range checks skip nulls (validate_data.py:29,104). */
  def violation: Column
}

/** Disallowed-null check (final_audit_producer.py:80-92). */
final case class NotNull(column: String) extends RowRule {
  val ruleName = "not_null"
  def violation: Column = col(column).isNull
}

/** Numeric range enforcement (validate_data.py:96-107). */
final case class InRange(column: String, min: Double, max: Double) extends RowRule {
  val ruleName = "numeric_range"
  def violation: Column =
    col(column).isNotNull && !col(column).between(min, max)
}

/** Categorical whitelist (validate_data.py:21-45). */
final case class InSet(column: String, allowed: Seq[String]) extends RowRule {
  val ruleName = "categorical_values"
  def violation: Column =
    col(column).isNotNull && !col(column).isin(allowed: _*)
}

/** Pattern conformance (extension of the reference's categorical check to
  * free-text columns). */
final case class MatchesRegex(column: String, pattern: String) extends RowRule {
  val ruleName = "regex_match"
  def violation: Column =
    col(column).isNotNull && !col(column).rlike(pattern)
}

sealed trait SchemaRule extends Rule

/** Schema conformity (validate_data.py:55-77): exact column-set match. */
final case class ExpectedColumns(columns: Seq[String]) extends SchemaRule {
  val ruleName = "schema_conformity"
}

/** Dtype enforcement (validate_data.py:79-88); dtype in Spark
  * `simpleString` form. */
final case class ExpectedType(column: String, dtype: String) extends SchemaRule {
  val ruleName = "dtype_enforcement"
}

/** Key-uniqueness check (the reference reaches this through the duplicates
  * module; here it is a first-class rule). */
final case class UniqueKey(columns: Seq[String]) extends Rule {
  val ruleName = "unique_key"
}
