package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Privacy-governance audits over quasi-identifier (QI) columns —
  * k-anonymity and l-diversity (Sweeney 2002; Machanavajjhala et al.
  * 2007, both public literature). A release is k-anonymous when every QI
  * equivalence class holds ≥ k rows, and l-diverse when every class
  * carries ≥ l distinct values of the sensitive attribute. Extends the
  * reference's PII surface (mcp tools' pii scan — here CorpusOps.piiScan,
  * SURVEY §2 row 62) from per-value detection to release-level risk.
  *
  * Scale shape: ONE keyed aggregation over the QI columns (map-side
  * combined, classes-sized exchange); l-diversity rides the same shuffle
  * as a distinct-count on the sensitive column. The output is
  * equivalence-class-sized — bounded by the QI domain product, not the
  * corpus.
  */
object Anonymity {

  /** Per-equivalence-class audit: the QI columns + `class_size`,
    * `n_sensitive` (distinct sensitive values, exact), and the k/l
    * verdicts. A row with `k_violation` identifies a class whose members
    * are re-identifiable to fewer than k candidates; `l_violation` marks
    * a class whose sensitive attribute is effectively disclosed. */
  def audit(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
            k: Int, l: Int): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one QI column")
    require(k >= 1 && l >= 1, s"k and l must be >= 1, got k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .select(qiCols.map(col) ++ Seq(
        col("class_size"), col("n_sensitive"),
        (col("class_size") < k).as("k_violation"),
        (col("n_sensitive") < l).as("l_violation")): _*)
  }

  /** Release-level summary — one row: total rows/classes, the achieved
    * k (min class size) and l (min distinct sensitive per class), the
    * violating class/row counts at the requested thresholds, and the
    * fraction of rows at re-identification risk. */
  def summary(df: DataFrame, qiCols: Seq[String], sensitiveCol: String,
              k: Int, l: Int): DataFrame = {
    audit(df, qiCols, sensitiveCol, k, l)
      .agg(
        sum(col("class_size")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("k_achieved"),
        min(col("n_sensitive")).as("l_achieved"),
        sum(when(col("k_violation"), 1L).otherwise(0L)).as("k_violating_classes"),
        sum(when(col("k_violation"), col("class_size")).otherwise(0L))
          .as("k_violating_rows"),
        sum(when(col("l_violation"), 1L).otherwise(0L)).as("l_violating_classes"))
      .withColumn("at_risk_frac",
        graft.Num.dround(
          col("k_violating_rows").cast(DoubleType)
            / col("n_rows").cast(DoubleType), 6))
  }
}
