package graft

import graft.functions.UnicodeNorm.unicodeNormalize
import org.apache.spark.sql.functions._

/** Pins for the native [[graft.functions.UnicodeNormalize]] expression:
  * composition/decomposition round trips, the compatibility folds, the
  * already-normalized fast path, nulls, codegen survival, and refusals. */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9"      // e-acute as one codepoint
  private val decomposed = "cafe\u0301" // e + combining acute

  test("NFC composes, NFD decomposes, and they round-trip") {
    val df = Seq((1L, decomposed), (2L, composed)).toDF("id", "s")
    val out = df.select(col("id"),
        unicodeNormalize(col("s"), "NFC").as("nfc"),
        unicodeNormalize(col("s"), "NFD").as("nfd"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == (composed, decomposed))
    assert(out(2L) == (composed, decomposed))
    // equality is restored for downstream joins/fingerprints
    assert(out(1L)._1 == out(2L)._1)
  }

  test("NFKC folds compatibility forms (ligature, full-width)") {
    val df = Seq(("\ufb01le", "\uff41\uff42\uff43")).toDF("lig", "wide")
    val r = df.select(
      unicodeNormalize(col("lig"), "NFKC"),
      unicodeNormalize(col("wide"), "NFKC")).collect()(0)
    assert(r.getString(0) == "file")
    assert(r.getString(1) == "abc")
    // NFC leaves compatibility forms alone
    val c = df.select(unicodeNormalize(col("lig"), "NFC")).collect()(0)
    assert(c.getString(0) == "\ufb01le")
  }

  test("ASCII and already-normalized text pass through; nulls stay null") {
    val df = Seq(Some("plain ascii text"), Some(composed), None).toDF("s")
    val out = df.select(unicodeNormalize(col("s"), "NFC")).collect()
    assert(out(0).getString(0) == "plain ascii text")
    assert(out(1).getString(0) == composed)
    assert(out(2).isNullAt(0))
  }

  test("the expression survives whole-stage codegen in a filter + projection") {
    val df = (1L to 100L).toDF("id")
      .withColumn("s", when(col("id") % 2 === 0, lit(decomposed))
        .otherwise(lit("plain")))
    val n = df.filter(unicodeNormalize(col("s"), "NFC") === composed).count()
    assert(n == 50L)
  }

  test("registers for SQL; the form must be a string literal") {
    graft.functions.GraftFunctions.register(spark)
    // Spark's chr() is mod-256 ASCII (DuckDB's is codepoint), so the
    // combining mark goes into the SQL text itself as UTF-8
    val r = spark.sql(
        s"SELECT unicode_normalize('$decomposed', 'NFC') AS s")
      .collect()(0).getString(0)
    assert(r == composed)
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize('x', lower('NFC'))").collect()
    }
  }

  test("unknown forms refuse at the column API and at analysis") {
    intercept[IllegalArgumentException] {
      unicodeNormalize(lit("x"), "NFX")
    }
    // analysis-time check (constructing the expression directly)
    val bad = graft.functions.UnicodeNormalize(
      org.apache.spark.sql.graftglue.ColumnGlue.expression(lit("x")), "NFX")
    assert(bad.checkInputDataTypes().isFailure)
    val notStr = graft.functions.UnicodeNormalize(
      org.apache.spark.sql.graftglue.ColumnGlue.expression(lit(3)), "NFC")
    assert(notStr.checkInputDataTypes().isFailure)
  }
}
