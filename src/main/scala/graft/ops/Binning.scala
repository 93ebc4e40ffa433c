package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Quantile (equal-frequency) binning — pandas `qcut` for a Spark pipeline
  * (feature discretization, score banding, stratification keys).
  *
  * Two paths, one semantics knob:
  *  - `exact = true`: standard SQL `ntile(q)` over the total order
  *    (value, tiebreak...) — bit-identical to any ANSI engine, bucket
  *    sizes differ by at most one row. The global window is a single
  *    sorted partition: correct at any size but serialized — the
  *    oracle-parity path, not the scale path.
  *  - `exact = false`: bin edges from `approx_percentile` (one aggregate
  *    pass), assignment is a scan-local comparison against the broadcast
  *    edge array — fully parallel, the 100 TB path. Bucket populations are
  *    then approximate near the edges (and ties all land in one bucket,
  *    pandas `qcut` behavior, unlike ntile which splits ties).
  */
object Binning {

  /** Append `outCol` (1-based bucket id) to `df`. `tiebreak` columns make
    * the exact path's total order — and therefore the result —
    * deterministic; they MUST make rows unique for cross-engine parity. */
  def equalFrequency(df: DataFrame, column: String, q: Int,
                     tiebreak: Seq[String] = Nil,
                     exact: Boolean = true,
                     outCol: String = "bin"): DataFrame = {
    require(q > 0, s"qcut needs q > 0, got $q")
    val x = col(column)
    if (exact) {
      val order = (x +: tiebreak.map(col)).toIndexedSeq
      df.filter(x.isNotNull)
        .withColumn(outCol, ntile(q).over(Window.orderBy(order: _*)))
    } else {
      val probs = (1 until q).map(_.toDouble / q)
      val edges = df.agg(percentile_approx(
        x.cast(DoubleType), lit(probs.toArray), lit(10000)).as("_gf_edges"))
      df.filter(x.isNotNull)
        .crossJoin(broadcast(edges))
        .withColumn(outCol,
          (size(filter(col("_gf_edges"), e => x.cast(DoubleType) > e)) + lit(1)))
        .drop("_gf_edges")
    }
  }

  /** The bin-edge frame of the approx path (for reporting/reuse): one row
    * per interior edge. */
  def approxEdges(df: DataFrame, column: String, q: Int): DataFrame = {
    require(q > 1, s"edges need q > 1, got $q")
    val probs = (1 until q).map(_.toDouble / q)
    df.agg(percentile_approx(col(column).cast(DoubleType),
      lit(probs.toArray), lit(10000)).as("edges"))
      .select(posexplode(col("edges")).as(Seq("edge_idx", "edge")))
  }

  /** Per-bucket summary (count, min, max) — the qcut report table. */
  def summary(binned: DataFrame, column: String,
              binCol: String = "bin"): DataFrame =
    binned.groupBy(binCol)
      .agg(count(lit(1)).as("n"),
        min(col(column)).as("lo"),
        max(col(column)).as("hi"))
      .orderBy(binCol)
}
