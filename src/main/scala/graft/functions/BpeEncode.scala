package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE encoding as a native expression: text → subword array under a
  * fixed merge table ([[graft.text.Bpe]]'s apply side). The merge table
  * is a constructor parameter — numMerges-bounded, serialized with the
  * plan like any broadcast dimension — and the greedy rank-merge kernel
  * is [[graft.text.Bpe.encodeWord]]. Codegen emits a call through a
  * plan-reference to this expression instance (the rank map builds once
  * per executor, not per row), so the projection stays inside
  * whole-stage codegen.
  *
  * Tokenization matches [[graft.text.TextAnalysis.tokens]] (lower,
  * spaces-only trim, `\s+` split) with empty words skipped — the same
  * word stream the trainer counted.
  */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def prettyName: String = "bpe_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${child.dataType.simpleString}")

  @transient private lazy val ranks: java.util.HashMap[(String, String), Int] = {
    val m = new java.util.HashMap[(String, String), Int]()
    merges.zipWithIndex.foreach { case (p, i) => m.put(p, i) }
    m
  }

  /** Shared eval/codegen kernel. */
  def encodeText(u: UTF8String): ArrayData = {
    val words = BpeEncode.Ws.split(u.trim().toLowerCase().toString, -1)
    val out = Array.newBuilder[UTF8String]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val subs = graft.text.Bpe.encodeWord(words(i), ranks)
        var j = 0
        while (j < subs.length) { out += UTF8String.fromString(subs(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.result().asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    encodeText(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeExpr", this,
      classOf[BpeEncode].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encodeText($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncodeFun {
  /** Column API. */
  def bpeEncode(c: Column, merges: Seq[(String, String)]): Column =
    ColumnGlue.column(BpeEncode(ColumnGlue.expression(c), merges))
}

private[functions] object BpeEncode {
  val Ws: Pattern = Pattern.compile("\\s+")
}
