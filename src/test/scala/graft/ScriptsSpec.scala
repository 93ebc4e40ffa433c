package graft

import org.apache.spark.sql.functions._

import graft.text.Scripts

/** Pins for the Unicode-script profile (SURVEY §2 row 155): hand-counted
  * mixed-script fixtures, dominant-script tie order, whitespace/digit
  * classes, null/empty discipline. */
class ScriptsSpec extends SparkSpec {
  import spark.implicits._

  private val cyr = " \u043f\u0440\u0438\u0432\u0435\u0442" // " privet"
  private val han = "\u4f60\u597d"                               // "ni hao"

  test("hand-counted mixed-script fixture") {
    val df = Seq((1L, s"hello 42$cyr$han")).toDF("id", "text")
    val r = Scripts.profile(df, "id", "text").collect().head
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    // "hello 42 привет你好": 5 latin + sp + 2 digit + sp + 6 cyr + 2 han
    assert(m("n_chars") == 17L)
    assert(m("n_latin") == 5L)
    assert(m("n_digit") == 2L)
    assert(m("n_space") == 2L)
    assert(m("n_cyrillic") == 6L)
    assert(m("n_han") == 2L)
    assert(m("n_greek") == 0L && m("n_arabic") == 0L)
    assert(m("n_other") == 0L)
    assert(m("dominant_script") == "cyrillic")
  }

  test("dominant-script ties resolve in Classes order; none when no script") {
    val df = Seq(
      (1L, "ab \u043f"),       // 2 latin vs 1 cyrillic -> latin
      (2L, "123 456"),          // digits only -> none
      (3L, "ab \u043f\u0440")) // 2 latin, 2 cyrillic -> tie -> latin (Classes order)
      .toDF("id", "text")
    val out = Scripts.profile(df, "id", "text")
      .orderBy("id").collect().map(_.getAs[String]("dominant_script")).toSeq
    assert(out == Seq("latin", "none", "latin"))
  }

  test("null and empty text profile as zeros") {
    val df = Seq((1L, Option.empty[String]), (2L, Option(""))).toDF("id", "text")
    val out = Scripts.profile(df, "id", "text").orderBy("id").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_chars") == 0L)
      assert(r.getAs[Long]("n_other") == 0L)
      assert(r.getAs[String]("dominant_script") == "none")
    }
  }

  test("other counts unclassified punctuation") {
    val df = Seq((1L, "a,b;c!")).toDF("id", "text")
    val r = Scripts.profile(df, "id", "text").collect().head
    assert(r.getAs[Long]("n_latin") == 3L)
    assert(r.getAs[Long]("n_other") == 3L)
  }
}
