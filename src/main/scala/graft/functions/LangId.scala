package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-vote language ID as ONE native kernel (r14).
  *
  * The column form ([[graft.text.TextAnalysis.languageIdColumns]])
  * references the token array from TEN sub-expressions — one
  * `filter(toks, array_contains(...))` per language for `greatest`, and
  * the same five again in the tie-break `when` chain — and because the
  * higher-order functions are CodegenFallback, the projection leaves
  * whole-stage codegen AND loses common-subexpression elimination, so
  * the `split(lower(trim(text)))` under them re-evaluates per reference
  * (the [[TextQuality]] finding, squared). One kernel walk computes all
  * five vote counts in a single tokenizer pass.
  *
  * Semantic parity is EXACT by construction — the same engine
  * primitives in the same order as the column composite:
  * `UTF8String.trim` (spaces only), `UTF8String.toLowerCase`,
  * java.util.regex `\s+` split with limit −1, per-token OCCURRENCE
  * counting against each language's list (filter+size counts
  * occurrences, not distinct types), max vote wins, ties resolve in
  * [[Langs]] order, all-zero votes → "unknown". TextSpec pins kernel ≡
  * column composite on edge cases and the sf0.001 corpus.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "lang_id"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    LangId.id(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangId.id($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangId {

  /** Column API. */
  def langId(c: Column): Column =
    ColumnGlue.column(LangIdExpr(ColumnGlue.expression(c)))

  private val Ws: Pattern = Pattern.compile("\\s+")

  /** Language order + stopword lists — must stay in lockstep with
    * [[graft.text.TextAnalysis.stopwords]] (TextSpec pins the
    * equivalence against the column composite, which reads that list). */
  private val Langs: Array[String] = Array("en", "de", "es", "fr", "zh")
  private val Stops: Array[java.util.HashSet[String]] = {
    val lists = Seq(
      Seq("the", "and", "of", "to", "in", "is", "a", "that"),
      Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
      Seq("el", "la", "de", "que", "y", "los", "es", "una"),
      Seq("le", "la", "les", "de", "et", "est", "une", "que"),
      Seq("的", "是", "了", "在", "我", "有", "和", "不"))
    lists.map { l =>
      val s = new java.util.HashSet[String]()
      l.foreach(s.add)
      s
    }.toArray
  }

  private val Unknown = UTF8String.fromString("unknown")
  private val LangU: Array[UTF8String] = Langs.map(UTF8String.fromString)

  /** Static kernel (also the codegen target): one tokenize walk, five
    * occurrence counters, argmax with first-in-order tie-break. */
  def id(u: UTF8String): UTF8String = {
    // the column composite's exact operand chain: lower(trim(text))
    val s = u.trim().toLowerCase().toString
    val toks = Ws.split(s, -1)
    val hits = new Array[Int](Langs.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var l = 0
      while (l < Stops.length) {
        if (Stops(l).contains(t)) hits(l) += 1
        l += 1
      }
      i += 1
    }
    var best = hits(0)
    var l = 1
    while (l < hits.length) { if (hits(l) > best) best = hits(l); l += 1 }
    if (best <= 0) Unknown
    else {
      var w = 0
      while (hits(w) != best) w += 1
      LangU(w)
    }
  }
}
