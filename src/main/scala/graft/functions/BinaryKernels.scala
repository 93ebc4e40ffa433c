package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Popcount/Hamming kernels over packed bit-code words (BINARY columns)
  * — the inner ops of the 1-bit (sign) embedding quantization route
  * ([[graft.sim.Binary]], the 32× end of the float32 → SQ8 → PQ → binary
  * compression ladder; FAISS's `IndexBinaryFlat` search shape).
  *
  * Both are single generated loops over the byte word inside whole-stage
  * codegen: a binary Hamming scan reads ceil(d/8) bytes per row instead
  * of 4·d float bytes, and each XOR+popcount step covers 8 dimensions —
  * the arithmetic-intensity win that makes binary shortlisting the
  * cheapest first pass at corpus scale.
  */
object BinaryKernels {
  /** Σ bitCount over a byte word (shared by eval and generated code). */
  def popcount(a: Array[Byte]): Int = {
    var n = 0; var i = 0
    while (i < a.length) { n += java.lang.Integer.bitCount(a(i) & 0xff); i += 1 }
    n
  }

  /** Hamming distance between two equal-length byte words. A length
    * mismatch is a mixed-dimension corpus — corrupt input, not a data
    * condition — and fails loudly (the segmentDedup precondition
    * discipline) rather than returning a silently wrong distance. */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    if (a.length != b.length) throw new IllegalArgumentException(
      s"graft: bin_hamming code words differ in length (${a.length} vs " +
        s"${b.length} bytes) — the corpus and query were binarized at " +
        "different dimensionalities")
    var n = 0; var i = 0
    while (i < a.length) { n += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff); i += 1 }
    n
  }
}

/** Number of set bits in a packed code word — the per-vector positive-sign
  * count of the binarized embedding. NULL word → NULL. */
case class BinPopcount(child: Expression) extends UnaryExpression {
  override def prettyName: String = "bin_popcount"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary code word, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    BinaryKernels.popcount(v.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BinaryKernels.popcount($c)")

  override protected def withNewChildInternal(newChild: Expression): BinPopcount =
    copy(child = newChild)
}

/** Hamming distance between two packed code words (popcount of the XOR).
  * NULL on either side → NULL; a byte-length mismatch throws (see
  * [[BinaryKernels.hamming]]). */
case class BinHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "bin_hamming"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two binary code words, got ${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    BinaryKernels.hamming(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.BinaryKernels.hamming($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BinHamming =
    copy(left = newLeft, right = newRight)
}
