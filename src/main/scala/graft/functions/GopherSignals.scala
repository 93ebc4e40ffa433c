package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The seven Gopher §A1.1 document signals as ONE native kernel (r14).
  *
  * The column form ([[graft.text.GopherRules]]' original composite,
  * retained as `signalsColumns` for the equivalence spec) references the
  * token array from an `aggregate` HOF (length sum), a `filter` HOF with
  * a per-token regex (alpha fraction), and eight `array_contains` probes,
  * plus the line array from two `filter` HOFs with per-line regexes — and
  * because the higher-order functions are CodegenFallback, the projection
  * leaves whole-stage codegen AND loses common-subexpression elimination,
  * so the `split(lower(trim(text)))` under them re-evaluates per
  * reference (the [[TextQuality]]/[[LangId]] finding). One kernel walk
  * computes every signal in a single tokenizer + line pass.
  *
  * Semantic parity is EXACT by construction — the same engine primitives
  * in the same order as the column composite: `UTF8String.trim` (spaces
  * only) for the blank test and the token source, `toLowerCase`,
  * java.util.regex `\s+` split with limit −1 (empty tokens COUNT, exactly
  * as `size(split(...))` counts them), code-point token lengths with the
  * ANSI int-overflow check, non-overlapping `regexp_count` semantics for
  * the symbol set over the RAW text, `\n`-split lines of the RAW text
  * with `rlike`-style unanchored `find` for bullets/ellipses, `\p{L}`
  * per-token find for the alpha fraction, DISTINCT stopword presence, and
  * the identical dround(·, 6) on every fraction. GopherRulesSpec pins
  * kernel ≡ column composite on crafted edge cases and the sf0.001
  * corpus.
  */
case class GopherSignalsExpr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "gopher_signals"
  override def dataType: DataType = GopherSignals.schema

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    GopherSignals.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherSignals.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherSignalsExpr =
    copy(child = newChild)
}

/** The Gopher keep VERDICT as one boolean kernel: signals + the seven
  * rule comparisons in a single call. The struct-kernel + field-extract
  * form loses common-subexpression elimination inside FilterExec (unlike
  * ProjectExec, filter predicates get no subexpression pass), so a
  * filter over seven extracts re-ran the whole signal walk per rule —
  * this kernel is the filter/flag path; [[GopherSignalsExpr]] stays the
  * audit-projection path. Rule comparisons are the same IEEE compares as
  * [[graft.text.GopherRules]]' keepExpr, over the same kernel signals. */
case class GopherKeepExpr(child: Expression,
                          minWords: Int, maxWords: Int,
                          minMeanWordLen: Double, maxMeanWordLen: Double,
                          maxSymbolWordRatio: Double,
                          maxBulletLineFrac: Double,
                          maxEllipsisLineFrac: Double,
                          minAlphaWordFrac: Double,
                          minStopHits: Int) extends UnaryExpression {

  override def prettyName: String = "gopher_keep"
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    GopherSignals.keep(input.asInstanceOf[UTF8String], minWords, maxWords,
      minMeanWordLen, maxMeanWordLen, maxSymbolWordRatio, maxBulletLineFrac,
      maxEllipsisLineFrac, minAlphaWordFrac, minStopHits)

  // Double thresholds are emitted as longBitsToDouble(<bits>L), not
  // string-interpolated: "Infinity"/"NaN" are legal Double values
  // (reachable via string-parsed config thresholds) but invalid Java
  // literals — interpolating them would fail codegen compilation and
  // silently fall back to interpreted evaluation.
  private def dlit(d: Double): String =
    s"java.lang.Double.longBitsToDouble(${java.lang.Double.doubleToLongBits(d)}L)"

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherSignals.keep($c, $minWords, $maxWords, " +
        s"${dlit(minMeanWordLen)}, ${dlit(maxMeanWordLen)}, " +
        s"${dlit(maxSymbolWordRatio)}, ${dlit(maxBulletLineFrac)}, " +
        s"${dlit(maxEllipsisLineFrac)}, ${dlit(minAlphaWordFrac)}, " +
        s"$minStopHits)")

  override protected def withNewChildInternal(newChild: Expression): GopherKeepExpr =
    copy(child = newChild)
}

object GopherSignals {

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("mean_word_len", DoubleType, nullable = false),
    StructField("symbol_ratio", DoubleType, nullable = false),
    StructField("bullet_frac", DoubleType, nullable = false),
    StructField("ellipsis_frac", DoubleType, nullable = false),
    StructField("alpha_frac", DoubleType, nullable = false),
    StructField("stop_hits", IntegerType, nullable = false)))

  /** Column API. */
  def gopherSignals(c: Column): Column =
    ColumnGlue.column(GopherSignalsExpr(ColumnGlue.expression(c)))

  /** Column API for the keep verdict. */
  def gopherKeep(c: Column, minWords: Int, maxWords: Int,
                 minMeanWordLen: Double, maxMeanWordLen: Double,
                 maxSymbolWordRatio: Double, maxBulletLineFrac: Double,
                 maxEllipsisLineFrac: Double, minAlphaWordFrac: Double,
                 minStopHits: Int): Column =
    ColumnGlue.column(GopherKeepExpr(ColumnGlue.expression(c),
      minWords, maxWords, minMeanWordLen, maxMeanWordLen,
      maxSymbolWordRatio, maxBulletLineFrac, maxEllipsisLineFrac,
      minAlphaWordFrac, minStopHits))

  /** Static keep kernel (also the codegen target): one [[compute]] walk,
    * then the seven rule compares — identical IEEE comparisons to
    * GopherRules.keepExpr over the same signal values. */
  def keep(u: UTF8String, minWords: Int, maxWords: Int,
           minMeanWordLen: Double, maxMeanWordLen: Double,
           maxSymbolWordRatio: Double, maxBulletLineFrac: Double,
           maxEllipsisLineFrac: Double, minAlphaWordFrac: Double,
           minStopHits: Int): Boolean = {
    val r = compute(u)
    val nWords = r.getInt(0)
    nWords >= minWords && nWords <= maxWords &&
      r.getDouble(1) >= minMeanWordLen && r.getDouble(1) <= maxMeanWordLen &&
      r.getDouble(2) <= maxSymbolWordRatio &&
      r.getDouble(3) <= maxBulletLineFrac &&
      r.getDouble(4) <= maxEllipsisLineFrac &&
      r.getDouble(5) >= minAlphaWordFrac &&
      r.getInt(6) >= minStopHits
  }

  private val Ws: Pattern = Pattern.compile("\\s+")
  private val Nl: Pattern = Pattern.compile("\n")
  private val Hash: Pattern = Pattern.compile("#")
  private val Dots: Pattern = Pattern.compile("\\.\\.\\.")
  private val Hellip: Pattern = Pattern.compile("…")
  private val Bullet: Pattern = Pattern.compile("^\\s*[-*•‣▪]")
  private val EllipsisEnd: Pattern = Pattern.compile("(\\.\\.\\.|…)\\s*$")
  private val Letter: Pattern = Pattern.compile("\\p{L}")

  /** Gopher's stopword signature — must stay in lockstep with
    * [[graft.text.GopherRules.stopwords]] (GopherRulesSpec pins the
    * equivalence against the column composite, which reads that list). */
  private val Stops: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  private def dround6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  private def countMatches(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** Static kernel (also the codegen target). */
  def compute(u: UTF8String): InternalRow = {
    val raw = u.toString
    val trimmed = u.trim()
    val blank = trimmed.numChars() == 0
    val toks = Ws.split(trimmed.toLowerCase().toString, -1)

    val nWords = if (blank) 0 else toks.length
    val nWordsD = math.max(nWords.toDouble, 1.0)

    // exact int length sum (code points, the engine's length()) with the
    // ANSI overflow check the column aggregate carries
    var lenSum = 0
    var alphaWords = 0
    var stopMask = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      lenSum = math.addExact(lenSum, t.codePointCount(0, t.length))
      if (Letter.matcher(t).find()) alphaWords += 1
      var s = 0
      while (s < Stops.length) {
        if ((stopMask & (1 << s)) == 0 && t == Stops(s)) stopMask |= 1 << s
        s += 1
      }
      i += 1
    }
    var stopHits = 0
    var s = 0
    while (s < Stops.length) {
      if ((stopMask & (1 << s)) != 0) stopHits += 1
      s += 1
    }

    val meanLen =
      if (blank) 0.0 else dround6(lenSum.toDouble / nWordsD)
    val symbols = countMatches(Hash, raw) + countMatches(Dots, raw) +
      countMatches(Hellip, raw)
    val symbolRatio = dround6(symbols.toDouble / nWordsD)

    val lines = Nl.split(raw, -1)
    val nLinesD = math.max(lines.length.toDouble, 1.0)
    var bullets = 0
    var ellipses = 0
    var j = 0
    while (j < lines.length) {
      val l = lines(j)
      if (Bullet.matcher(l).find()) bullets += 1
      if (EllipsisEnd.matcher(l).find()) ellipses += 1
      j += 1
    }
    val bulletFrac = dround6(bullets.toDouble / nLinesD)
    val ellipsisFrac = dround6(ellipses.toDouble / nLinesD)
    val alphaFrac = dround6(alphaWords.toDouble / nWordsD)

    new GenericInternalRow(Array[Any](
      nWords, meanLen, symbolRatio, bulletFrac, ellipsisFrac,
      alphaFrac, stopHits))
  }
}
