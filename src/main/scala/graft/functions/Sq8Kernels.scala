package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** One-pass SQ8 kernels behind [[Sq8Audit]] / [[Sq8Encode]] — the fused
  * form of [[graft.sim.Quantize]]'s HOF composites, which the scale
  * ladder measured at ~7 ms/vector: every `transform` lambda referencing
  * the min/max scalars re-materializes the cast array per ELEMENT after
  * project collapsing (O(d²) array builds), and the exact-decimal MSE
  * fold allocates a BigDecimal per element in interpreted eval (higher-
  * order functions are CodegenFallback). The kernel is three linear
  * passes over the raw array with primitive accumulators — the
  * TextQuality measure-then-fuse precedent.
  *
  * Bit parity with the HOF composite (pinned in QuantizeSpec): the
  * quantize/dequantize arithmetic is the same single-IEEE-op chain, and
  * the MSE's 12-dp-rounded squared errors are integer-valued doubles
  * accumulated in a long (exact, like the DECIMAL(30,12) sum), with the
  * final long/1e12 division correctly rounded exactly as the
  * decimal→double conversion is.
  */
object Sq8Kernel {

  private def reader(a: ArrayData, float: Boolean): Int => Double =
    if (float) i => a.getFloat(i).toDouble else i => a.getDouble(i)

  /** (n_dims, vmin, scale, max_abs_err, mse) or null for empty/null-
    * element vectors (no code book exists). */
  def audit(a: ArrayData, float: Boolean): InternalRow = {
    val stats = minMaxScale(a, float)
    if (stats == null) return null
    val Array(mn, _, scale) = stats
    val n = a.numElements()
    val x = reader(a, float)
    var maxAbs = 0.0
    var sumTerms = 0L // Σ floor(e²·1e12 + 0.5): integer-exact like the decimal sum
    var i = 0
    while (i < n) {
      val xi = x(i)
      val q = math.min(255.0, math.max(0.0, math.floor((xi - mn) / scale + 0.5)))
      val e = xi - (mn + q * scale)
      val ae = math.abs(e)
      if (ae > maxAbs) maxAbs = ae
      val t = math.floor(e * e * 1e12 + 0.5)
      // exact-arithmetic guard: past Long range the integer sum would
      // wrap silently (and the DECIMAL composite would overflow to NULL
      // just as silently) — a vector with range ≫ 10⁶ has no meaningful
      // 8-bit quantization, so refuse loudly instead
      if (t >= Long.MaxValue.toDouble || sumTerms > Long.MaxValue - t.toLong)
        throw new ArithmeticException(
          s"sq8_audit: squared-error sum exceeds exact integer range " +
            s"(element range ${scale * 255.0} too large for 12-dp exact MSE) — " +
            "8-bit quantization of such a spread is not meaningful; rescale first")
      sumTerms += t.toLong
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, mn, scale,
      math.floor(maxAbs * 1e7 + 0.5) / 1e7,
      math.floor((sumTerms / 1e12) / n.toDouble * 1e10 + 0.5) / 1e10))
  }

  /** (n_dims, vmin, scale, codes, sum_c, sum_c2) or null like [[audit]].
    * Code sums are integers < 2⁵³ — exact in plain doubles. */
  def encode(a: ArrayData, float: Boolean): InternalRow = {
    val stats = minMaxScale(a, float)
    if (stats == null) return null
    val Array(mn, _, scale) = stats
    val n = a.numElements()
    val x = reader(a, float)
    val codes = new Array[Byte](n)
    var sumC = 0.0
    var sumC2 = 0.0
    var i = 0
    while (i < n) {
      val q = math.min(255.0, math.max(0.0, math.floor((x(i) - mn) / scale + 0.5)))
      codes(i) = q.toInt.toByte
      sumC += q
      sumC2 += q * q
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, mn, scale, codes, sumC, sumC2))
  }

  /** [mn, mx, scale], or null when the vector is empty or has a null
    * element (array_min/array_max would be null). */
  private def minMaxScale(a: ArrayData, float: Boolean): Array[Double] = {
    val n = a.numElements()
    if (n == 0) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val x = reader(a, float)
    var mn = x(0)
    var mx = x(0)
    i = 1
    while (i < n) {
      val v = x(i)
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    Array(mn, mx, if (mx > mn) (mx - mn) / 255.0 else 1.0)
  }
}

sealed trait Sq8Expr extends UnaryExpression {
  override def nullable: Boolean = true
  protected def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${other.simpleString}")
  }
}

/** Fused per-vector int8 quantization AUDIT — see [[Sq8Kernel.audit]]. */
case class Sq8Audit(child: Expression) extends Sq8Expr {
  override def prettyName: String = "sq8_audit"
  override def dataType: DataType = Sq8Audit.schema
  override def nullSafeEval(input: Any): Any =
    Sq8Kernel.audit(input.asInstanceOf[ArrayData], isFloat)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val r = ctx.freshName("sq8Row")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.functions.Sq8Kernel.audit($arr, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Sq8Audit =
    copy(child = newChild)
}

object Sq8Audit {
  /** Field order is load-bearing: the kernel fills the row positionally. */
  val schema: StructType = StructType(Seq(
    StructField("n_dims", LongType, nullable = false),
    StructField("vmin", DoubleType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("max_abs_err", DoubleType, nullable = false),
    StructField("mse", DoubleType, nullable = false)))
}

/** Fused per-vector SQ8 ENCODE — see [[Sq8Kernel.encode]]. */
case class Sq8Encode(child: Expression) extends Sq8Expr {
  override def prettyName: String = "sq8_encode"
  override def dataType: DataType = Sq8Encode.schema
  override def nullSafeEval(input: Any): Any =
    Sq8Kernel.encode(input.asInstanceOf[ArrayData], isFloat)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val r = ctx.freshName("sq8Row")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r =
         |  graft.functions.Sq8Kernel.encode($arr, $isFloat);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

object Sq8Encode {
  /** Field order is load-bearing: the kernel fills the row positionally. */
  val schema: StructType = StructType(Seq(
    StructField("n_dims", LongType, nullable = false),
    StructField("vmin", DoubleType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", BinaryType, nullable = false),
    StructField("sum_c", DoubleType, nullable = false),
    StructField("sum_c2", DoubleType, nullable = false)))
}
