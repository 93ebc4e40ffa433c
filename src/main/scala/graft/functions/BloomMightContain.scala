package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe against a broadcast Bloom filter — the
  * runtime-filter half of [[graft.text.CorpusOps.decontaminateBloom]].
  *
  * The filter ships to executors once via a torrent broadcast (the
  * expression holds only the `Broadcast` handle, so the task binary stays
  * small no matter how large the filter is) and each row pays one
  * `mightContainLong` — a couple of cache-line reads — inside whole-stage
  * codegen. No false negatives: a `false` here proves the key is absent,
  * so rows dropped by this predicate can never change an exact join's
  * result; false positives only cost the downstream exact check.
  *
  * Child must be a LONG key (pair it with `xxhash64(...)` over the probe
  * value, and build the filter over the same hash on the build side).
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a LONG key (hash the probe value first), " +
        s"got ${other.simpleString}")
  }

  override def nullSafeEval(h: Any): Any =
    bloom.value.mightContainLong(h.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    nullSafeCodeGen(ctx, ev, h =>
      s"""
         |${ev.value} = ((org.apache.spark.util.sketch.BloomFilter)
         |  $bcRef.value()).mightContainLong($h);
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API: `true` iff `key` (a LONG) might be in `bloom`. */
  def apply(key: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnGlue.column(BloomMightContain(ColumnGlue.expression(key), bloom))
}
