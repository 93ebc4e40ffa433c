package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftglue.ColumnGlue
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (UAX #15) as a native Catalyst expression — the
  * pre-dedup step a multilingual corpus cannot skip: "é" arrives both
  * composed (U+00E9) and decomposed (e + U+0301) from real crawls, and
  * without canonicalization every downstream equality — exact-dup
  * fingerprints, n-gram joins, MinHash shingles, vocabulary counts —
  * silently treats them as different text. Normalize ONCE at ingest;
  * every equality after that is byte-meaningful.
  *
  * Forms: NFC (canonical compose — the storage/interchange default, and
  * the one DuckDB mirrors via `nfc_normalize`, which keeps the operator
  * oracle-checkable), NFD, NFKC (compatibility fold — ligatures,
  * full-width forms; the usual tokenizer-prep choice), NFKD.
  *
  * Codegen emits a call to the static [[UnicodeNorm.normalize]] kernel
  * (whole-stage codegen, no interpreted fallback). The kernel fast-paths
  * already-normalized text — `Normalizer.isNormalized` is a quick-check
  * scan that returns without allocating for ASCII and most real text, so
  * the common case costs one pass and zero copies, and the original
  * UTF8String is returned UNCHANGED (no re-encode). */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  override def prettyName: String = "unicode_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string, got ${child.dataType.simpleString}")
    else if (!UnicodeNorm.Forms.contains(formName))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${UnicodeNorm.Forms.mkString(", ")}, " +
          s"got '$formName'")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    UnicodeNorm.normalize(v.asInstanceOf[UTF8String], formName)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"""graft.functions.UnicodeNorm.normalize($s, "$formName")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNorm {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Static kernel shared by interpreted eval and codegen. Returns the
    * INPUT object untouched when already normalized (the overwhelmingly
    * common case — ASCII and pre-normalized text). */
  def normalize(s: UTF8String, formName: String): UTF8String = {
    val form = java.text.Normalizer.Form.valueOf(formName)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }

  /** Column API; `form` is one of NFC, NFD, NFKC, NFKD. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column = {
    require(Forms.contains(form),
      s"form must be one of ${Forms.mkString(", ")}, got '$form'")
    ColumnGlue.column(UnicodeNormalize(ColumnGlue.expression(c), form))
  }
}
