package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd squared Euclidean distance over two float/double/int/
  * long array columns — the per-subspace metric of product quantization
  * ([[graft.sim.Pq]]): every Lloyd assignment and every ADC lookup-table
  * build scores subvectors against codebook entries with it. Same fused-
  * loop/widening/null design as [[VecCosine]] (one generated loop, NULL on
  * length mismatch or null element). */
case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vec_l2sq"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val supported: Set[DataType] =
    Set(FloatType, DoubleType, IntegerType, LongType)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(l, _), ArrayType(r, _))
        if supported.contains(l) && supported.contains(r) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two float/double/int/long arrays, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def reader(t: DataType): (ArrayData, Int) => Double = t match {
    case FloatType   => (a, i) => a.getFloat(i).toDouble
    case DoubleType  => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType    => (a, i) => a.getLong(i).toDouble
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val readA = reader(elemType(left)); val readB = reader(elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = readA(a, i) - readB(b, i)
      acc += d * d
      i += 1
    }
    acc
  }

  private def getterName(t: DataType): String = t match {
    case FloatType => "getFloat"; case DoubleType => "getDouble"
    case IntegerType => "getInt"; case LongType => "getLong"
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getterA = getterName(elemType(left))
    val getterB = getterName(elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $d = (double) $a.$getterA($i) - (double) $b.$getterB($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd L2 normalization: array<float|double> → array<double>
  * of unit norm (an all-zero vector passes through as zeros). One
  * generated two-pass loop per row — replacing the composable HOF
  * formulation (`transform(v, x / sqrt(aggregate(zip_with(v,v,*),...)))`),
  * whose interpreted lambdas get INLINED by CollapseProject into every
  * consumer of the normalized column: the PQ subspace explode references
  * it once per subspace, turning one 64-dim normalization into sixteen.
  * As a single deterministic codegen'd expression it both participates in
  * whole-stage subexpression elimination and costs ~2·dim flops even when
  * duplicated. NULL array → NULL; any NULL element → NULL. */
case class VecNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "vec_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private val supported: Set[DataType] = Set(FloatType, DoubleType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if supported.contains(t) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float|double>, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x; acc += x * x
      i += 1
    }
    val nrm = math.sqrt(acc)
    if (nrm != 0.0) {
      i = 0
      while (i < n) { out(i) /= nrm; i += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out"); val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      s"""
         |final int $n = $a.numElements();
         |final double[] $out = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $out[$i] = (double) $a.$getter($i);
         |  $acc += $out[$i] * $out[$i];
         |}
         |if (!${ev.isNull}) {
         |  final double $nrm = java.lang.Math.sqrt($acc);
         |  if ($nrm != 0.0) {
         |    for (int $i = 0; $i < $n; $i++) { $out[$i] /= $nrm; }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VecNormalize =
    copy(child = newChild)
}

/** Pack an `array<int>` of byte-range values (0..255) into a `binary` —
  * the PQ code word: M sub-quantizer indices stored as M BYTES per vector
  * instead of M ints (at 100 TB, the difference between an index that fits
  * in executor memory and one that doesn't: 64-dim float embeddings are
  * 256 B/row; an M=8 code word is 8 B — 32×). Throws on out-of-range
  * values — a code outside 0..255 is index corruption, and silently
  * truncating it would rank with the wrong centroids. */
case class PackBytes(child: Expression) extends UnaryExpression {

  override def prettyName: String = "pack_bytes"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<int>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    PqCodec.pack(arr)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.PqCodec.pack($arr);")

  override protected def withNewChildInternal(newChild: Expression): PackBytes =
    copy(child = newChild)
}

/** ADC (asymmetric distance computation) accumulator: given a packed PQ
  * code word (`binary`, M bytes) and a query's flattened lookup table
  * (`array<double>`, M×Ks entries, subspace-major), return
  * Σ_m lut[m·Ks + code[m]] — the approximate distance of the PQ paper
  * (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
  * Search", IEEE TPAMI 2011, §III). One generated loop of M array reads
  * per (query, corpus-row) pair — this replaces a D-dimensional float
  * scan with M adds, which is the whole point of scanning codes instead
  * of vectors. Throws on a LUT whose length is not a multiple of Ks or a
  * code byte beyond the table — both mean the code word and the codebook
  * disagree (wrong index for this codebook), the PQ analogue of the
  * MinHash k-mismatch raise. */
case class PqAdcSum(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {

  override def prettyName: String = "pq_adc_sum"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) if ks >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckFailure(s"$prettyName needs ks >= 1, got $ks")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (binary, array<double>), got " +
            s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(code: Any, lut: Any): Any =
    PqCodec.adcSum(code.asInstanceOf[Array[Byte]],
      lut.asInstanceOf[ArrayData], ks)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lut) =>
      s"${ev.value} = graft.functions.PqCodec.adcSum($code, $lut, $ks);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcSum =
    copy(left = newLeft, right = newRight)
}

/** Static kernels behind [[PackBytes]] / [[PqAdcSum]] — standalone object
  * so generated code reaches them through plain static calls. */
object PqCodec {

  def pack(arr: ArrayData): Array[Byte] = {
    val m = arr.numElements()
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) {
      if (arr.isNullAt(i)) return null
      val v = arr.getInt(i)
      if (v < 0 || v > 255) throw new IllegalArgumentException(
        s"pack_bytes: value $v at position $i is outside 0..255 — " +
          "PQ codes are byte-range centroid indices")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  def adcSum(code: Array[Byte], lut: ArrayData, ks: Int): Double = {
    val m = code.length
    val n = lut.numElements()
    if (n != m.toLong * ks) throw new IllegalArgumentException(
      s"pq_adc_sum: LUT has $n entries but code has $m subspaces × ks=$ks " +
        "— code word and codebook disagree (wrong index for this codebook)")
    var acc = 0.0
    var i = 0
    while (i < m) {
      val c = code(i) & 0xff
      if (c >= ks) throw new IllegalArgumentException(
        s"pq_adc_sum: code $c at subspace $i exceeds ks=$ks — the code word " +
          "was written by a different (larger) codebook")
      acc += lut.getDouble(i * ks + c)
      i += 1
    }
    acc
  }
}
