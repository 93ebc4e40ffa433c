package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the time-series primitive Spark's built-in
  * joins lack (pandas `merge_asof`, kdb `aj`, DuckDB `ASOF JOIN`): each
  * left row is matched to the single right row with the greatest right
  * timestamp ≤ the left timestamp (backward; symmetric for forward),
  * within the same key group.
  *
  * Spark-first plan: NO join operator at all. Both sides are tagged and
  * unioned, then one window pass per key ordered by (ts, side) carries the
  * most recent right-side values forward onto left rows
  * (`last(..., ignoreNulls)` over an unbounded-preceding frame). Cost is a
  * single hash shuffle on the key columns + an in-partition sort —
  * equivalent to one sort-merge join pass, with no range-condition
  * explosion, no broadcast requirement, and no skew amplification beyond
  * what the key distribution itself carries. At 100 TB this is the
  * standard formulation: it scales exactly like a groupBy on the same
  * keys. (A naive `left.ts >= right.ts` range join would be O(n·m) per
  * key and is the classic scale cliff.)
  *
  * Determinism: if several right rows share one (key, ts), "the" as-of
  * row is ambiguous; pre-aggregate the right side to one row per
  * (key, ts) — as the shipped queries do — or accept the window's
  * (ts, side) sort tiebreak.
  */
object AsofJoin {

  /** Backward as-of join (inclusive: a right row AT the left timestamp
    * matches, like DuckDB `ON l.ts >= r.ts`).
    *
    * @param valueCols right-side columns carried onto each left row,
    *                  emitted as `<name><suffix>`; the matched right
    *                  timestamp is emitted as `<rightTs><suffix>`.
    * @param tolerance max allowed (leftTs - matchedTs) in the timestamp's
    *                  own unit, as a Column literal (e.g.
    *                  `expr("INTERVAL 1 HOUR")` for timestamps); matches
    *                  farther back are nulled out. None = unbounded.
    */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String, valueCols: Seq[String],
               suffix: String = "_asof",
               tolerance: Option[Column] = None): DataFrame =
    run(left, right, keyCols, leftTs, rightTs, valueCols, suffix, tolerance,
      forward = false)

  /** Forward as-of join: smallest right ts ≥ left ts (inclusive). */
  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
              leftTs: String, rightTs: String, valueCols: Seq[String],
              suffix: String = "_asof",
              tolerance: Option[Column] = None): DataFrame =
    run(left, right, keyCols, leftTs, rightTs, valueCols, suffix, tolerance,
      forward = true)

  private def run(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                  leftTs: String, rightTs: String, valueCols: Seq[String],
                  suffix: String, tolerance: Option[Column],
                  forward: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    require(valueCols.nonEmpty, "asof join needs at least one value column")
    val leftCols = left.columns.toSeq
    require(!leftCols.contains(s"$rightTs$suffix") &&
      !valueCols.exists(v => leftCols.contains(s"$v$suffix")),
      s"suffix '$suffix' collides with an existing left column")

    // Right rows carry only (keys, ts, values); left rows carry the full
    // left row with null right-values. `_gf_rts` is null on left rows so
    // last(..., ignoreNulls) skips them.
    val rTag = right.select(
      keyCols.map(col) ++
        Seq(col(rightTs).as("_gf_ts"), col(rightTs).as("_gf_rts"), lit(0).as("_gf_side")) ++
        valueCols.map(v => col(v).as(s"_gf_v_$v")): _*)
    val lTag = left.select(
      leftCols.map(col) ++
        Seq(col(leftTs).as("_gf_ts"), lit(null).cast(rTag.schema("_gf_rts").dataType).as("_gf_rts"),
          lit(1).as("_gf_side")) ++
        valueCols.map(v => lit(null).cast(rTag.schema(s"_gf_v_$v").dataType).as(s"_gf_v_$v")): _*)
    val unioned = lTag.unionByName(rTag, allowMissingColumns = true)

    // Backward: right(0) sorts before left(1) at equal ts, carry LAST
    // non-null backward-looking. Forward: left first at equal ts, take
    // FIRST non-null over the following frame.
    val w =
      if (forward)
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("_gf_ts").asc, col("_gf_side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("_gf_ts").asc, col("_gf_side").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def pick(c: Column): Column =
      if (forward) first(c, ignoreNulls = true).over(w)
      else last(c, ignoreNulls = true).over(w)

    val matchedTs = pick(col("_gf_rts"))
    val inTol = tolerance match {
      case Some(t) if forward => matchedTs <= col("_gf_ts") + t
      case Some(t) => matchedTs >= col("_gf_ts") - t
      case None => lit(true)
    }
    val withVals = unioned
      .withColumn(s"$rightTs$suffix", when(inTol, matchedTs))
      .withColumns(valueCols.map(v => s"$v$suffix" -> when(inTol, pick(col(s"_gf_v_$v")))).toMap)
    withVals.filter(col("_gf_side") === 1)
      .select(leftCols.map(col) ++
        Seq(col(s"$rightTs$suffix")) ++ valueCols.map(v => col(s"$v$suffix")): _*)
  }
}
