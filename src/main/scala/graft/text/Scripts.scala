package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode-script composition profile (UAX #24 script property) — the
  * language-consistency audit of a multilingual corpus: a document
  * tagged `lang=ru` whose codepoints are 95% Latin is mislabeled or
  * transliterated; a Han-dominant doc in an `en` shard pollutes the
  * mixture (the CCNet/CLD-family audit, complementary to the n-gram
  * langid in [[TextAnalysis]] — script is codepoint-exact and
  * vocabulary-free, langid is statistical). Counts are per-script
  * codepoint tallies via global regexp deletion (length(s) −
  * length(remove(script, s))), which keeps the whole profile one
  * codegen'd projection — no explode, no shuffle, embarrassingly
  * parallel per document.
  *
  * Cross-engine exactness: both engines count CODEPOINTS (Spark
  * `length` = UTF8String.numChars, DuckDB `length` = codepoints) over
  * the SAME script classes — Java regex `\p{IsXxx}` mirrors RE2
  * `\p{Xxx}` for the five majority scripts profiled here (stable
  * assignments since Unicode 3; exotic recently-assigned codepoints can
  * drift between engine Unicode versions, which is why the profile
  * sticks to the big five + digits + explicit whitespace and buckets
  * the rest as `other`). Whitespace is the EXPLICIT class [ \t\n\r] —
  * Java's \s and RE2's \s disagree on vertical tab.
  */
object Scripts {

  /** (name, Java regex class, RE2/DuckDB regex class). */
  val Classes: Seq[(String, String, String)] = Seq(
    ("latin", """\p{IsLatin}""", """\p{Latin}"""),
    ("cyrillic", """\p{IsCyrillic}""", """\p{Cyrillic}"""),
    ("greek", """\p{IsGreek}""", """\p{Greek}"""),
    ("han", """\p{IsHan}""", """\p{Han}"""),
    ("arabic", """\p{IsArabic}""", """\p{Arabic}"""),
    ("digit", """[0-9]""", """[0-9]"""),
    ("space", """[ \t\n\r]""", """[ \t\n\r]"""))

  private def countClass(s: Column, javaRe: String): Column =
    length(s) - length(regexp_replace(s, javaRe, ""))

  /** Per-document script profile: codepoint total, one count per class,
    * the unclassified remainder, and the dominant majority script (the
    * five scripts only; ties resolve in [[Classes]] order — a fixed,
    * mirrored rule). Null text profiles as empty. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val s = coalesce(col(textCol), lit(""))
    val counts = Classes.map { case (name, javaRe, _) =>
      countClass(s, javaRe).cast("long").as(s"n_$name")
    }
    val withCounts = df.select(col(idCol) +: length(s).cast("long").as("n_chars")
      +: counts: _*)
    val scriptNames = Classes.map(_._1).filterNot(n => n == "digit" || n == "space")
    val other = col("n_chars") - scriptNames.map(n => col(s"n_$n"))
      .reduce(_ + _) - col("n_digit") - col("n_space")
    val dominant = scriptNames.foldRight(lit("none")) { case (name, elseBranch) =>
      // first class in order with a strictly-positive count that is >=
      // every other script count wins
      when(col(s"n_$name") > 0 &&
        scriptNames.filterNot(_ == name)
          .map(o => col(s"n_$name") >= col(s"n_$o"))
          .reduce(_ && _), lit(name))
        .otherwise(elseBranch)
    }
    withCounts
      .withColumn("n_other", other)
      .withColumn("dominant_script", dominant)
  }

  /** DuckDB mirror: a `scripts_base` CTE body (counts per class) plus the
    * final projection, over `idCol`/`textExpr` from `table`. The caller
    * writes `WITH [...,] ${sqlProfile(...)} ORDER BY ...`. */
  def sqlProfile(table: String, idCol: String, textExpr: String): String = {
    val s = s"coalesce($textExpr, '')"
    val counts = Classes.map { case (name, _, re2) =>
      s"CAST(length($s) - length(regexp_replace($s, '$re2', '', 'g')) AS BIGINT) AS n_$name"
    }.mkString(",\n               ")
    val scriptNames = Classes.map(_._1).filterNot(n => n == "digit" || n == "space")
    val otherExpr = s"n_chars - ${scriptNames.map(n => s"n_$n").mkString(" - ")}" +
      " - n_digit - n_space"
    val dominant = scriptNames.map { name =>
      val ge = scriptNames.filterNot(_ == name)
        .map(o => s"n_$name >= n_$o").mkString(" AND ")
      s"WHEN n_$name > 0 AND $ge THEN '$name'"
    }.mkString(" ")
    s"""scripts_base AS (
           SELECT $idCol, CAST(length($s) AS BIGINT) AS n_chars,
               $counts
           FROM $table)
       SELECT $idCol, n_chars, ${Classes.map(c => s"n_${c._1}").mkString(", ")},
              CAST($otherExpr AS BIGINT) AS n_other,
              (CASE $dominant ELSE 'none' END) AS dominant_script
       FROM scripts_base"""
  }
}
