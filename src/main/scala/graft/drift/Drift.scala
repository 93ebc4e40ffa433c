package graft.drift

import org.apache.spark.sql.{DataFrame, Row}
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
}
