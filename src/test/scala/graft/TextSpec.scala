package graft

import graft.text.TextAnalysis
import graft.dedup.LlmDedup
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("token counts") {
    val df = Seq("hello world  foo", "", "  ", "a,b!").toDF("t")
    val rows = df.select(
      TextAnalysis.tokenCount(col("t")).as("ws"),
      TextAnalysis.regexTokenCount(col("t")).as("bpe")).collect()
    assert(rows(0).getInt(0) == 3)
    assert(rows(1).getInt(0) == 0 && rows(2).getInt(0) == 0)
    assert(rows(3).getInt(0) == 1)     // "a,b!" one ws token
    assert(rows(3).getInt(1) == 4)     // a , b !
  }

  test("language id picks dominant stopword list, unknown when none") {
    val df = Seq(
      "the cat and the dog is in a house",
      "der hund und die katze ist ein tier",
      "xyzzy qwerty").toDF("t")
    val out = df.select(TextAnalysis.languageId(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "de", "unknown"))
  }

  test("quality score rises with longer less-noisy text") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the forest in a day that is bright",
      "!!! ### $$$ %%%").toDF("t")
    val out = df.select(TextAnalysis.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(out(0) > out(1))
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("fingerprint is format-invariant") {
    val df = Seq("Hello,  World!", "hello world", "different").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t"))).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("exact dedup keeps smallest id per content group") {
    val df = Seq((1L, "Hello World"), (2L, "hello  world"), (3L, "unique"))
      .toDF("doc_id", "text")
    val kept = LlmDedup.exact(df, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
    val clusters = LlmDedup.exactClusters(df, "text", "doc_id").collect()
    assert(clusters.length == 1 && clusters(0).getAs[Long]("n_docs") == 2)
  }
}
