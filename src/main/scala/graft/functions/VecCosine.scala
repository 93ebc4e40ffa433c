package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two same-typed float/double
  * array columns — the hot inner op of ANN rerank and embedding dedup.
  *
  * The composable form (`zip_with` + `aggregate`, Similarity.dot) walks
  * the arrays once per sum with interpreted lambda dispatch per element;
  * this expression fuses dot(a,b), |a|² and |b|² into ONE generated Java
  * loop inside whole-stage codegen. Numerics are bit-identical to the
  * composable form: each accumulator sums in index order, and the final
  * combination `dot / (sqrt(na) * sqrt(nb))` is the same IEEE expression
  * tree — so oracle-checked results do not move.
  *
  * Null semantics (match the zip_with formulation): NULL array → NULL,
  * any NULL element → NULL, length mismatch → NULL.
  *
  * Input typing: each side may independently be an array of
  * float/double/int/long — elements widen to double in the loop itself
  * (the same coercions the zip_with formulation performed), so a float
  * corpus against a double query vector needs no array conversion.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vec_cosine"
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
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = readA(a, i); val y = readB(b, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
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
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = (double) $a.$getterA($i);
         |    final double $y = (double) $b.$getterB($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** Column API for [[VecCosine]], no registration needed. */
  def vecCosine(a: Column, b: Column): Column =
    ColumnGlue.column(
      VecCosine(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Column API for [[MinHashSig]]: K-lane MinHash signature of a shingle
    * array, one generated loop per row. */
  def minhashSig(shingles: Column, k: Int): Column =
    ColumnGlue.column(MinHashSig(ColumnGlue.expression(shingles), k))

  /** Column API for [[WavPcmStats]]: one-pass PCM16 sample statistics
    * (struct of exact integers) over a WAV blob column. */
  def wavPcmStats(bin: Column): Column =
    ColumnGlue.column(WavPcmStats(ColumnGlue.expression(bin)))

  /** Column API for [[VecL2Sq]]: squared Euclidean distance, one fused
    * generated loop. */
  def vecL2Sq(a: Column, b: Column): Column =
    ColumnGlue.column(
      VecL2Sq(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Column API for [[VecNormalize]]: unit-L2 array<double>, one
    * generated two-pass loop. */
  def vecNormalize(v: Column): Column =
    ColumnGlue.column(VecNormalize(ColumnGlue.expression(v)))

  /** Column API for [[PackBytes]]: array<int> (0..255) → binary. */
  def packBytes(codes: Column): Column =
    ColumnGlue.column(PackBytes(ColumnGlue.expression(codes)))

  /** Column API for [[DeflateLen]]: deflate-compressed byte length — the
    * compression-ratio quality signal. */
  def deflateLen(text: Column): Column =
    ColumnGlue.column(DeflateLen(ColumnGlue.expression(text)))

  /** Column API for [[BinPopcount]]: set bits of a packed bit-code word
    * (the positive-sign count of a binarized embedding). */
  def binPopcount(code: Column): Column =
    ColumnGlue.column(BinPopcount(ColumnGlue.expression(code)))

  /** Column API for [[BinHamming]]: popcount(a XOR b) over two packed
    * bit-code words, one generated loop. */
  def binHamming(a: Column, b: Column): Column =
    ColumnGlue.column(
      BinHamming(ColumnGlue.expression(a), ColumnGlue.expression(b)))

  /** Column API for [[PqAdcSum]]: Σ_m lut[m·ks + code[m]] over a packed
    * code word and a flattened per-query lookup table. */
  def pqAdcSum(code: Column, lut: Column, ks: Int): Column =
    ColumnGlue.column(
      PqAdcSum(ColumnGlue.expression(code), ColumnGlue.expression(lut), ks))

  /** Column API for [[Sq8Audit]]: one-pass int8 quantization error audit
    * (struct), fused — see Sq8Kernel. */
  def sq8Audit(vec: Column): Column =
    ColumnGlue.column(Sq8Audit(ColumnGlue.expression(vec)))

  /** Column API for [[Sq8Encode]]: one-pass SQ8 byte-code word + moments
    * (struct), fused — see Sq8Kernel. */
  def sq8Encode(vec: Column): Column =
    ColumnGlue.column(Sq8Encode(ColumnGlue.expression(vec)))

  /** SQL builder for [[UnicodeNormalize]] — the form must be a string
    * LITERAL (it parameterizes codegen; a column-valued form would need
    * per-row dispatch and exists in no engine's normalize either). */
  private[functions] def unicodeNormBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2,
      s"unicode_normalize(text, 'NFC') takes 2 arguments, got ${children.size}")
    val form = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(s, t)
          if t == org.apache.spark.sql.types.StringType && s != null =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"unicode_normalize's form must be a string literal, got ${other.sql}")
    }
    UnicodeNormalize(children.head, form)
  }

  /** Register `vec_cosine` + `jaro_winkler` + `unicode_normalize` for
    * SQL use in an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (children: Seq[Expression]) => VecCosine(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinklerSim(children.head, children(1)))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) => unicodeNormBuilder(children))
  }
}

/** `SparkSessionExtensions` hook — enable with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (children: Seq[Expression]) => VecCosine(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (children: Seq[Expression]) => JaroWinklerSim(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) => GraftFunctions.unicodeNormBuilder(children)))
  }
}
