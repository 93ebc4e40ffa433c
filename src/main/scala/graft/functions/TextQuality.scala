package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The composite text-quality score as ONE native kernel.
  *
  * The column form ([[graft.text.TextAnalysis.qualityScore]]'s original
  * composite) references the token array from four sub-expressions
  * (size, stopword filter, array_distinct, ratio) — and because the
  * higher-order functions are CodegenFallback, the projection leaves
  * whole-stage codegen AND loses common-subexpression elimination, so
  * the `split` under them re-evaluates per reference. Measured at the
  * ×64 scale rung: 33.2 s for the composite vs 8.7 s for a plain
  * tokenize of the same corpus — ~4× the scan floor for what is ONE
  * linear pass of work (the Gopher audit, same shape, costs 7.2 s; the
  * MinHashSig precedent: measure, then fuse only what dominates).
  *
  * This kernel computes every signal in one tokenizer walk. Semantic
  * parity is EXACT by construction — the same engine primitives in the
  * same order as the column composite: `UTF8String.trim` (spaces only,
  * what StringTrim calls), `UTF8String.toLowerCase`, java.util.regex
  * `\s+` split with limit −1 (what StringSplit does), `numChars` for
  * length, the same Java regex for the punctuation class, occurrence
  * (not distinct) stopword hits, and the identical IEEE expression
  * order ending in the 4-dp dround. TextSpec pins kernel ≡ column
  * composite on crafted edge cases (blank, tabs-only, unicode,
  * no-alnum) and the full sf0.001 corpus.
  */
case class TextQualityScore(child: Expression) extends UnaryExpression {

  override def prettyName: String = "text_quality_score"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextQuality.score(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextQuality.score($c)")

  override protected def withNewChildInternal(newChild: Expression): TextQualityScore =
    copy(child = newChild)
}

object TextQuality {

  /** Column API. */
  def textQualityScore(c: Column): Column =
    ColumnGlue.column(TextQualityScore(ColumnGlue.expression(c)))

  private val Ws: Pattern = Pattern.compile("\\s+")
  private val Punct: Pattern = Pattern.compile("[^A-Za-z0-9\\s]")

  /** EN signature stopwords — must stay in lockstep with
    * [[graft.text.TextAnalysis.stopwords]]'s "en" entry (TextSpec pins
    * the equivalence against the column composite, which reads that
    * list). */
  private val EnStops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "and", "of", "to", "in", "is", "a", "that").foreach(s.add)
    s
  }

  /** Java-regex `\s` (the ASCII set — NOT Character.isWhitespace, which
    * would also match U+001C-1F and Unicode spaces the regex does not). */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** Static kernel (also the codegen target): the exact composite
    *   dround4(0.3·min(1, n/50) + 0.3·(1 − min(1, punct/chars))
    *          + 0.2·min(1, stop/max(n,1)·5) + 0.2·(distinct/max(n,1)))
    *
    * Fast path: a single hand-rolled char walk (no regex, no token
    * array) for pure-ASCII text — measured on the ×64 rung's 320k-doc
    * corpus: regex chain 35 µs/row single-threaded vs 6 µs for the walk,
    * and the full Spark projection 14.7 s → 0.30 s (the JIT'd walk also
    * stays allocation-light where Pattern.split churns token arrays).
    * Any non-ASCII char falls back to [[scoreGeneric]], which IS the
    * engine-primitive chain, so the two paths cannot diverge on the
    * inputs the fast path declines. */
  def score(u: UTF8String): Double = {
    val s = u.toString
    val len = s.length
    // ASCII check up front — mixed content takes the generic path whole.
    var i = 0
    while (i < len) { if (s.charAt(i) >= 0x80) return scoreGeneric(u); i += 1 }

    // punct = [^A-Za-z0-9\s] over the ORIGINAL text; chars = its length
    var punct = 0
    i = 0
    while (i < len) {
      val c = s.charAt(i)
      if (!isAlnum(c) && !isWs(c)) punct += 1
      i += 1
    }
    // trim (SPACES only — Spark's StringTrim) then tokenize on \s+ runs,
    // reproducing Pattern.split(-1): leading separator mints an empty
    // first token, a trailing separator an empty last one, "" -> [""].
    var lo = 0; var hi = len - 1
    while (lo <= hi && s.charAt(lo) == ' ') lo += 1
    while (hi >= lo && s.charAt(hi) == ' ') hi -= 1
    val seen = new java.util.HashSet[String](64)
    var nTokI = 0; var stopHits = 0
    def addTok(from: Int, until: Int): Unit = {
      nTokI += 1
      var j = from
      val b = new java.lang.StringBuilder(until - from)
      while (j < until) {
        val c = s.charAt(j)
        b.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
        j += 1
      }
      val t = b.toString
      if (EnStops.contains(t)) stopHits += 1
      seen.add(t): Unit
    }
    var tokStart = lo
    i = lo
    while (i <= hi) {
      if (isWs(s.charAt(i))) {
        addTok(tokStart, i)                      // empty when run-leading
        while (i <= hi && isWs(s.charAt(i))) i += 1
        tokStart = i
      } else i += 1
    }
    addTok(tokStart, hi + 1)                     // last (or only/empty) token

    val nTok = nTokI.toDouble
    val distinct = seen.size.toDouble
    val chars = math.max(len.toDouble, 1.0)
    val nTokFloor = math.max(nTok, 1.0)
    val lenScore = math.min(1.0, nTok / 50.0)
    val punctScore = 1.0 - math.min(1.0, punct.toDouble / chars)
    val stopScore = math.min(1.0, stopHits.toDouble / nTokFloor * 5.0)
    val distinctRatio = distinct / nTokFloor
    val total = 0.3 * lenScore + 0.3 * punctScore +
      0.2 * stopScore + 0.2 * distinctRatio
    math.floor(total * 1e4 + 0.5) / 1e4
  }

  /** The engine-primitive chain — exact parity with the column
    * composite by construction (same UTF8String trim/lowercase, same
    * java.util.regex split/matcher); the fast path's non-ASCII
    * fallback and the spec's equivalence oracle. */
  private[functions] def scoreGeneric(u: UTF8String): Double = {
    // the column composite's exact operand chain: lower(trim(text))
    val s = u.trim().toLowerCase().toString
    val toks = Ws.split(s, -1)
    val nTok = toks.length.toDouble
    val seen = new java.util.HashSet[String](math.max(16, toks.length * 2))
    var stopHits = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (EnStops.contains(t)) stopHits += 1
      seen.add(t)
      i += 1
    }
    val distinct = seen.size.toDouble
    var punct = 0
    val m = Punct.matcher(u.toString)
    while (m.find()) punct += 1
    val chars = math.max(u.numChars().toDouble, 1.0)
    val nTokFloor = math.max(nTok, 1.0)
    val lenScore = math.min(1.0, nTok / 50.0)
    val punctScore = 1.0 - math.min(1.0, punct.toDouble / chars)
    val stopScore = math.min(1.0, stopHits.toDouble / nTokFloor * 5.0)
    val distinctRatio = distinct / nTokFloor
    val total = 0.3 * lenScore + 0.3 * punctScore +
      0.2 * stopScore + 0.2 * distinctRatio
    math.floor(total * 1e4 + 0.5) / 1e4
  }
}
