package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed byte length of a string — the compression-ratio
  * quality signal of modern curation stacks (highly repetitive or
  * templated text compresses far below natural prose, so
  * deflated/raw ratio separates boilerplate from content with zero
  * linguistic assumptions; the signal family of RedPajama-v2/Dolma's
  * quality annotations — public).
  *
  * One generated call per row into a static JDK-zlib helper (level 6,
  * raw deflate): java.util.zip is deterministic for a fixed input,
  * level, and strategy, so results are stable across runs, partitions,
  * and executors — but NOT expressible in ANSI SQL, which is why the
  * registry query is rows-only with spec-side pins instead of a DuckDB
  * oracle. NULL string → NULL; empty string → 0.
  */
object DeflateKernel {
  /** Raw-deflate length at level 6. A fresh Deflater per call: the
    * expression evaluates inside codegen'd loops on many threads, and a
    * shared instance would need locking that costs more than the
    * allocation (Deflater is a thin wrapper over a native zlib stream). */
  def deflatedLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 0
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** `deflate_len(text)` → INT: compressed byte length (see
  * [[DeflateKernel]]). */
case class DeflateLen(child: Expression) extends UnaryExpression {
  override def prettyName: String = "deflate_len"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string column, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    DeflateKernel.deflatedLen(v.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateKernel.deflatedLen($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}
