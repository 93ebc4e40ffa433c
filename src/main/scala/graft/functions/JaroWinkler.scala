package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity in [0,1] as a native Catalyst expression
  * — the token-aware scorer used for fuzzy master-list correction
  * (reference: normalize_data.py:72-103 scores with thefuzz; Jaro-Winkler
  * is the classic typo-tolerant alternative to plain edit distance).
  *
  * Semantics pinned against DuckDB's `jaro_winkler_similarity` so the
  * operator is oracle-checkable cross-engine:
  *  - standard Jaro with match window max(|a|,|b|)/2 - 1 (floor, min 0)
  *  - Winkler prefix boost (p=0.1, common prefix capped at 4) applied only
  *    when the Jaro score exceeds 0.7
  *  - either side empty → 0.0 (including both empty)
  *  - case-sensitive, compared on UTF-16 code units
  *
  * Codegen emits a call to the static [[JaroWinkler.similarity]] kernel —
  * the expression stays inside whole-stage codegen (no interpreted
  * projection fallback) and the kernel JITs like any hot static method.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two strings, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Column API. */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnGlue.column(
      JaroWinklerSim(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Static kernel (also the codegen target). */
  def similarity(a: String, b: String): Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val half = t / 2
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - half) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(la, lb))
    while (prefix < cap && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
