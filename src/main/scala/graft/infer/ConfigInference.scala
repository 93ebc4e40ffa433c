package graft.infer

import graft.impute.{ImputeStrategy, Median, Mode}
import graft.outliers.{DetectMethod, Iqr}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Inferred cleaning configuration for a frame — the Spark-native
  * counterpart of the reference's `infer_configs` MCP tool (the first half
  * of `auto_heal.py`: "infer and apply cleaning rules in one go").
  *
  * Deterministic rules:
  *  - numeric column with nulls        -> impute Median
  *  - string column with nulls         -> impute Mode
  *  - non-key numeric column           -> outlier spec Iqr(1.5)
  *  - string column with <= `catThreshold` distincts -> categorical
  *    whitelist (sorted distinct values)
  *  - every column                     -> expected type = current dtype
  */
final case class InferredConfig(
    imputation: Map[String, ImputeStrategy],
    outlierSpecs: Map[String, DetectMethod],
    categoricalWhitelists: Map[String, Seq[String]],
    expectedTypes: Map[String, String])

object ConfigInference {

  private def isKeyLike(name: String): Boolean = {
    val n = name.toLowerCase
    n == "id" || n.endsWith("_id") || n.endsWith("key")
  }

  /** Two bounded passes: (1) per-column null + distinct counts — tiny
    * scalars; (2) sorted whitelists collected ONLY for the columns pass 1
    * proved low-cardinality. Never `collect_set` on an unbounded column
    * (a high-cardinality string column would haul its whole domain into
    * the aggregation state at 100 TB).
    *
    * Distinct counts use HLL `approx_count_distinct`: exact multi-column
    * `count_distinct` in one agg compiles to an Expand that multiplies
    * scanned rows by ~2×#columns and shuffles whole-column distinct state.
    * The sketch only SCREENS candidates, with 2× headroom (Spark's HLL is
    * dense; near-threshold estimates can be off by a few percent — never
    * by 2×) — the categorical DECISION is exact: pass 2 collects the
    * candidate columns' value sets (bounded ≤ ~2×catThreshold by the
    * screen) and whitelists only those with ≤ catThreshold exact values,
    * so the output matches exact-count semantics on every input. */
  def infer(df: DataFrame, catThreshold: Int = 20): InferredConfig = {
    val fields = df.schema.fields
    val aggs = fields.flatMap { f =>
      // default rsd: a tighter rsd (0.01) inflates the HLL buffer enough
      // to slow the whole aggregate ~25× (measured 51 s vs 2 s at sf0.1),
      // and the ≤ catThreshold decision sits in the sparse-exact regime
      // at any rsd anyway.
      Seq((count(lit(1)) - count(col(f.name))).cast(LongType).as(s"__n_${f.name}"),
        approx_count_distinct(col(f.name)).as(s"__d_${f.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).collect()(0)

    val imputation = fields.flatMap { f =>
      val nulls = row.getAs[Long](s"__n_${f.name}")
      if (nulls == 0) None
      else f.dataType match {
        case _: NumericType => Some(f.name -> (Median: ImputeStrategy))
        case StringType => Some(f.name -> (Mode: ImputeStrategy))
        case _ => None
      }
    }.toMap

    val outlierSpecs = fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !isKeyLike(f.name) =>
        f.name -> (Iqr(1.5): DetectMethod)
    }.toMap

    val catCandidates = fields.collect {
      case f if f.dataType == StringType &&
        row.getAs[Long](s"__d_${f.name}") <= catThreshold * 2L => f.name
    }
    val whitelists: Map[String, Seq[String]] =
      if (catCandidates.isEmpty) Map.empty
      else {
        val wAggs = catCandidates.map(c => sort_array(collect_set(col(c))).as(s"__w_$c"))
        val wRow = df.agg(wAggs.head, wAggs.tail.toIndexedSeq: _*).collect()(0)
        catCandidates.map(c => c -> wRow.getSeq[String](wRow.fieldIndex(s"__w_$c")).toSeq)
          .filter(_._2.size <= catThreshold).toMap
      }

    val types = fields.map(f => f.name -> f.dataType.simpleString).toMap

    InferredConfig(imputation, outlierSpecs, whitelists, types)
  }

  /** The inference as an audit artifact: (kind, column_name, suggestion),
    * ordered — what the reference returns to the MCP client. */
  def suggestions(df: DataFrame, catThreshold: Int = 20): DataFrame = {
    val cfg = infer(df, catThreshold)
    val rows =
      cfg.imputation.toSeq.map { case (c, s) =>
        ("imputation", c, s match { case Median => "median"; case Mode => "mode"; case other => other.toString })
      } ++
      cfg.outlierSpecs.toSeq.map { case (c, _) => ("outlier_spec", c, "iqr(1.5)") } ++
      cfg.categoricalWhitelists.toSeq.map { case (c, vs) =>
        ("categorical_whitelist", c, vs.mkString(","))
      } ++
      cfg.expectedTypes.toSeq.map { case (c, t) => ("expected_type", c, t) }
    df.sparkSession.createDataFrame(rows)
      .toDF("kind", "column_name", "suggestion")
      .orderBy("kind", "column_name")
  }
}
