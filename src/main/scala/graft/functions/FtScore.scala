package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** fastText scoring as a per-row kernel over an in-memory weight map —
  * the third classifier route, after string-keyed joins (oracle parity)
  * and hashed broadcast joins (the bounded-vocabulary path): the weight
  * MAP rides the serialized expression to every executor and each
  * document scores in one projection with NO join and NO aggregation
  * exchange. The [[LmScoreRow]] discipline — this is what makes the
  * supervised gate STREAMABLE (a per-doc aggregate needs stateful
  * streaming, a projection doesn't), and operationally it is how
  * fastText itself runs (the model file ships to workers).
  *
  * Value parity with [[graft.text.FastText.score]]/`scoreHashed` is
  * exact: the same gram stream (lower/trim/`\s+` unigrams+bigrams,
  * empties filtered), per-feature weights 6-dp dround'd and accumulated
  * as exact decimals (BigDecimal scale 6 — order-independent), the same
  * decimal→double mean, dround'd activation, and sigmoid on the
  * already-rounded activation. The hashed lane uses the engine's own
  * xxhash64 (seed 42) so bucket routing is bit-identical to the join
  * route. FastTextSpec pins all routes value-identical; the driver
  * oracle proves the string lane against DuckDB end-to-end.
  *
  * `buckets > 0` selects the hashed lane (keys = `pmod(xxhash64(gram),
  * buckets)` into `hashedWeights`); `buckets == 0` the string lane
  * (`weights`). Output: struct(n_feats BIGINT, activation DOUBLE,
  * score DOUBLE) — null activation/score for no-feature documents (no
  * evidence), matching the join routes' left-join semantics. */
case class FtScoreRow(child: Expression,
                      weights: Map[String, Double],
                      hashedWeights: Map[Long, Double],
                      buckets: Int, bias: Double)
    extends UnaryExpression {

  require(buckets >= 0, s"buckets must be >= 0, got $buckets")

  override def prettyName: String = "ft_score_row"
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("activation", DoubleType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${child.dataType.simpleString}")

  // boxed values (the LmScoreRow note): a primitive-valued map would
  // unbox a missing key's null to 0.0 — here that HAPPENS to match the
  // absent-feature weight, but only by coincidence; keep the branch
  // explicit so the coalesce point stays visible and auditable.
  @transient private lazy val strJ: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](weights.size * 2)
    weights.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }
  @transient private lazy val bucketJ: java.util.HashMap[java.lang.Long, java.lang.Double] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Double](hashedWeights.size * 2)
    hashedWeights.foreach { case (k, v) =>
      m.put(java.lang.Long.valueOf(k), java.lang.Double.valueOf(v)) }
    m
  }

  private def weightOf(gram: String): Double = {
    val w: java.lang.Double =
      if (buckets > 0) {
        val h = XxHash64Function.hash(
          UTF8String.fromString(gram), StringType, 42L)
        val b = ((h % buckets) + buckets) % buckets
        bucketJ.get(java.lang.Long.valueOf(b))
      } else strJ.get(gram)
    if (w eq null) 0.0 else w.doubleValue()
  }

  /** Shared eval/codegen kernel. */
  def scoreRow(u: UTF8String): InternalRow = {
    val trimmed = u.trim()
    if (trimmed.numBytes() == 0)
      return new GenericInternalRow(Array[Any](0L, null, null))
    val toks = FtScoreRow.Ws.split(trimmed.toLowerCase().toString, -1)
    var sum = java.math.BigDecimal.ZERO
    var n = 0L
    def add(gram: String): Unit = {
      sum = sum.add(java.math.BigDecimal.valueOf(
        math.floor(weightOf(gram) * 1e6 + 0.5) / 1e6).setScale(6))
      n += 1
    }
    var i = 0
    while (i < toks.length) {
      if (toks(i).nonEmpty) add(toks(i))
      i += 1
    }
    i = 0
    while (i < toks.length - 1) {
      // a bigram always contains its space separator, so gramsCol's
      // length > 0 filter keeps EVERY bigram — including the degenerate
      // ones a tab-only text produces (split keeps leading/trailing
      // empties; Spark's trim strips spaces only). Add unconditionally
      // to stay value-identical with the join routes.
      add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    if (n == 0L) return new GenericInternalRow(Array[Any](0L, null, null))
    val mean = sum.doubleValue() / n
    val act = math.floor((bias + mean) * 1e6 + 0.5) / 1e6
    val score = math.floor(
      (1.0 / (1.0 + Math.exp(-act))) * 1e6 + 0.5) / 1e6
    new GenericInternalRow(Array[Any](n, act, score))
  }

  override def nullSafeEval(input: Any): Any =
    scoreRow(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ftScoreExpr", this, classOf[FtScoreRow].getName)
    defineCodeGen(ctx, ev, c => s"$ref.scoreRow($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): FtScoreRow =
    copy(child = newChild)
}

object FtScoreRow {
  private[functions] val Ws: Pattern = Pattern.compile("\\s+")

  /** Column API — string lane. */
  def ftScoreRow(c: Column, weights: Map[String, Double],
                 bias: Double): Column =
    ColumnGlue.column(FtScoreRow(
      ColumnGlue.expression(c), weights, Map.empty, 0, bias))

  /** Column API — hashed-bucket lane. */
  def ftScoreRowHashed(c: Column, hashedWeights: Map[Long, Double],
                       buckets: Int, bias: Double): Column = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    ColumnGlue.column(FtScoreRow(
      ColumnGlue.expression(c), Map.empty, hashedWeights, buckets, bias))
  }
}
