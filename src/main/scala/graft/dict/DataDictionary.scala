package graft.dict

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-dictionary builder — Spark-native counterpart of the reference's
  * `m00_utils/data_dictionary_builder.py` (semantic typing at :55-77,
  * examples at :80-96).
  *
  * Semantic type combines static signals (column name, Spark dtype) with
  * the reference's data-dependent categorical heuristic
  * `distinct <= min(20, max(5, non_null/2))`, all folded into ONE
  * aggregation pass. Examples are (min, max) — deterministic, O(1) state —
  * instead of pandas "first N seen" which has no distributed meaning.
  */
object DataDictionary {

  private def staticType(f: StructField): Option[String] = {
    val n = f.name.toLowerCase
    if (n == "id" || n.endsWith("_id") || n.endsWith("key")) Some("identifier")
    else f.dataType match {
      case BooleanType => Some("boolean")
      case _: TimestampType | DateType | TimestampNTZType => Some("datetime")
      case _: IntegerType | LongType | ShortType | ByteType => Some("integer")
      case _: DoubleType | FloatType | _: DecimalType => Some("numeric")
      case StringType => None // data-dependent: categorical vs text
      case other => Some(other.simpleString)
    }
  }

  /** One row per column: semantic type, dtype, distinct/null counts,
    * min/max example values. `exact=false` uses HLL distincts (100 TB
    * path). */
  def build(df: DataFrame, exact: Boolean = true): DataFrame = {
    val entries = df.schema.fields.map { f =>
      val c = col(f.name)
      val nonNull = count(c)
      val distinct: Column = if (exact) count_distinct(c) else approx_count_distinct(c)
      val semantic: Column = staticType(f) match {
        case Some(t) => lit(t)
        case None =>
          when(distinct.cast(DoubleType) <=
              least(lit(20.0), greatest(lit(5.0), floor(nonNull / lit(2.0)))),
            lit("categorical")).otherwise(lit("text"))
      }
      struct(
        lit(f.name).as("column_name"),
        semantic.as("semantic_type"),
        lit(f.dataType.simpleString).as("dtype"),
        distinct.cast(LongType).as("distinct_count"),
        (count(lit(1)) - nonNull).cast(LongType).as("null_count"),
        min(c).cast(StringType).as("example_min"),
        max(c).cast(StringType).as("example_max"))
    }
    df.agg(array(entries.toIndexedSeq: _*).as("m"))
      .select(explode(col("m")).as("e")).select("e.*")
      .orderBy("column_name")
  }
}
