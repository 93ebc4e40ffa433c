package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate detection/handling — Spark-native counterpart of the
  * reference's `m04_duplicates/{detect_dupes,handle_dupes}.py`.
  *
  * pandas relies on implicit row order for `keep='first'`; a distributed
  * engine has none, so [[drop]] takes an explicit tiebreak ordering — the
  * determinism the reference gets by accident becomes part of the API.
  * All shapes are single keyed reductions (one hash shuffle on the subset
  * key); no O(n²) comparisons.
  */
object Duplicates {

  /** Members of duplicate groups get `is_duplicate=true` — pandas
    * `df.duplicated(subset, keep=False)` (detect_dupes.py:13-41). */
  def flag(df: DataFrame, subset: Seq[String] = Nil): DataFrame = {
    val keys = if (subset.nonEmpty) subset else df.columns.toSeq
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("is_duplicate", count(lit(1)).over(w) > 1)
  }

  /** All rows belonging to a duplicate cluster, sorted by the subset keys
    * (detect_dupes.py:33-36). */
  def clusters(df: DataFrame, subset: Seq[String] = Nil): DataFrame = {
    val keys = if (subset.nonEmpty) subset else df.columns.toSeq
    flag(df, subset).filter(col("is_duplicate")).drop("is_duplicate")
      .orderBy(keys.map(col): _*)
  }

  sealed trait Keep
  /** Keep the first row per group under `tiebreak` ascending. */
  case object KeepFirst extends Keep
  /** Keep the last row per group under `tiebreak` ascending. */
  case object KeepLast extends Keep
  /** Drop every member of a duplicate group (pandas keep=False). */
  case object KeepNone extends Keep

  /** Remove duplicates (handle_dupes.py:14-28) with explicit determinism:
    * `tiebreak` defines which row is "first". */
  def drop(df: DataFrame, subset: Seq[String], keep: Keep,
           tiebreak: Seq[Column]): DataFrame = {
    val keys = if (subset.nonEmpty) subset else df.columns.toSeq
    val part = Window.partitionBy(keys.map(col): _*)
    keep match {
      case KeepFirst =>
        df.withColumn("_gf_rn", row_number().over(part.orderBy(tiebreak: _*)))
          .filter(col("_gf_rn") === 1).drop("_gf_rn")
      case KeepLast =>
        df.withColumn("_gf_rn",
            row_number().over(part.orderBy(tiebreak.map(_.desc): _*)))
          .filter(col("_gf_rn") === 1).drop("_gf_rn")
      case KeepNone =>
        df.withColumn("_gf_cnt", count(lit(1)).over(part))
          .filter(col("_gf_cnt") === 1).drop("_gf_cnt")
    }
  }
}
