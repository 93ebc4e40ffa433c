package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bigram-LM scoring as a per-row kernel over an in-memory model — the
  * third LM route, after string-keyed joins (oracle parity) and
  * hashed-key broadcast joins (the shuffle-light path): the count MAPS
  * ride the serialized expression to every executor and each document
  * scores in one projection with NO join and NO aggregation exchange at
  * all. This is what CCNet actually does operationally (the KenLM model
  * ships to workers); it is also what makes the LM gate STREAMABLE — a
  * per-doc aggregate needs stateful streaming, a projection doesn't.
  *
  * Value parity with [[graft.text.LangModel.score]] is exact: the same
  * tokenizer chain (spaces-only trim, lowercase, `\s+` split with
  * limit −1 over the full token array, empties included), the same three
  * backoff branches with the same IEEE operand order (`Math.log`, the
  * engine's Log), per-pair 6-dp dround accumulated as exact decimals
  * (BigDecimal scale 6 — order-independent), and the same
  * decimal→double-then-divide-then-4-dp-dround finish. LangModelSpec
  * pins all three routes value-identical on the closed-form fixture and
  * the driver oracle re-proves it at both scales.
  *
  * Output: struct(n_scored BIGINT, avg_logprob DOUBLE) — null fields
  * for blank/single-token documents (no evidence), matching score().
  */
case class LmScoreRow(child: Expression,
                      unigrams: Map[String, Long],
                      bigrams: Map[(String, String), Long],
                      total: Long, backoff: Double)
    extends UnaryExpression {

  override def prettyName: String = "lm_score_row"
  override def dataType: DataType = StructType(Seq(
    StructField("n_scored", LongType, nullable = false),
    StructField("avg_logprob", DoubleType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${child.dataType.simpleString}")

  // boxed values: a primitive-valued java.util.HashMap would unbox a
  // missing key's null to 0L and silently take the wrong backoff branch
  @transient private lazy val uniJ: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](unigrams.size * 2)
    unigrams.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }
  @transient private lazy val biJ: java.util.HashMap[(String, String), java.lang.Long] = {
    val m = new java.util.HashMap[(String, String), java.lang.Long](bigrams.size * 2)
    bigrams.foreach { case (k, v) => m.put(k, java.lang.Long.valueOf(v)) }
    m
  }

  /** Shared eval/codegen kernel. */
  def scoreRow(u: UTF8String): InternalRow = {
    val trimmed = u.trim()
    if (trimmed.numBytes() == 0)
      return new GenericInternalRow(Array[Any](0L, null))
    val toks = LmScoreRow.Ws.split(trimmed.toLowerCase().toString, -1)
    if (toks.length < 2)
      return new GenericInternalRow(Array[Any](0L, null))
    val t = total.toDouble
    var sum = java.math.BigDecimal.ZERO
    var i = 0
    while (i < toks.length - 1) {
      val prev = toks(i); val w = toks(i + 1)
      val cb = biJ.get((prev, w))
      val lp =
        if (cb ne null) {
          val cprev = uniJ.get(prev)
          Math.log(cb.doubleValue() / cprev.doubleValue())
        } else {
          val cw = uniJ.get(w)
          if (cw ne null) Math.log(backoff * cw.doubleValue() / t)
          else Math.log(backoff / t)
        }
      sum = sum.add(java.math.BigDecimal.valueOf(
        math.floor(lp * 1e6 + 0.5) / 1e6).setScale(6))
      i += 1
    }
    val n = (toks.length - 1).toLong
    val avg = math.floor(sum.doubleValue() / n * 1e4 + 0.5) / 1e4
    new GenericInternalRow(Array[Any](n, avg))
  }

  override def nullSafeEval(input: Any): Any =
    scoreRow(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmScoreExpr", this, classOf[LmScoreRow].getName)
    defineCodeGen(ctx, ev, c => s"$ref.scoreRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LmScoreRow =
    copy(child = newChild)
}

object LmScoreRow {
  private[functions] val Ws: Pattern = Pattern.compile("\\s+")

  /** Column API. */
  def lmScoreRow(c: Column, unigrams: Map[String, Long],
                 bigrams: Map[(String, String), Long],
                 total: Long, backoff: Double): Column =
    ColumnGlue.column(LmScoreRow(
      ColumnGlue.expression(c), unigrams, bigrams, total, backoff))
}
