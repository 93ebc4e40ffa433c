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

  test("fused quality kernel is value-identical to the column composite") {
    // edge cases the kernel's hand-rolled walk could get wrong: blank,
    // spaces-only, tab-led (Spark trim strips SPACES only, so a leading
    // tab survives into the split and mints an empty first token),
    // unicode text + supplementary plane (numChars vs UTF-16 length),
    // punctuation-only, stopword-dense, repeated tokens, long text
    val edges = Seq("", " ", "   ", "\thello", "a", "the", "the the the",
      "héllo wörld straße 中文 的 是", "😀 emoji 𝔘nicode test", "!!!...###",
      "the and of to in is a that", "x " * 100 + "y",
      "Mixed CASE The AND Of", "a,b!c.d", "line\nbreaks\nhere",
      "the quick brown fox jumps over the lazy dog and that is of to in",
      // separator-boundary cases for the fast path's hand-rolled split:
      // trailing/leading non-space whitespace survives Spark's trim
      // (spaces only) and mints empty tokens under \s+ split(-1)
      "end\t", "vtab", "vtmid", "a\fb", "\r\n", "a  b   c", " \t mixed \r ",
      "tab\tsep\ttoks", "only~tilde", "digits 123 456")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq
    val df = (edges ++ corpus).toDF("t")
    val mismatches = df.select(
        TextAnalysis.qualityScore(col("t")).as("fused"),
        TextAnalysis.qualityScoreColumns(col("t")).as("composite"))
      .filter(not(col("fused") <=> col("composite")))
      .count()
    assert(mismatches == 0)
  }

  test("fused langid kernel is value-identical to the column composite") {
    // the quality-kernel edge set plus multilingual vote/tie cases: equal
    // votes across languages must resolve in stopwords order, shared
    // stopwords ("de"/"la"/"que"/"es" appear in several lists) must count
    // for every list containing them, zh stopwords are non-ASCII
    val edges = Seq("", " ", "\thello", "the", "der die das", "el la de",
      "le la les", "的 是 了", "the der", "der the", "de de de",
      "la la la", "que que", "es ist", "the and der und",
      "héllo wörld straße 中文 的 是", "😀 emoji test", "!!!...###",
      "mixed The DER el LE 的", "a  b   c", " \t mixed \r ",
      "the quick brown fox and that is of to in")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text")).as[String].collect().toSeq
    val df = (edges ++ corpus).toDF("t")
    val mismatches = df.select(
        TextAnalysis.languageId(col("t")).as("fused"),
        TextAnalysis.languageIdColumns(col("t")).as("composite"))
      .filter(not(col("fused") <=> col("composite")))
      .count()
    assert(mismatches == 0)
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

  test("ngrams: bigrams, short docs, and blank docs") {
    val df = Seq("a b c d", "single", "", "x y").toDF("t")
    val out = df.select(TextAnalysis.ngrams(col("t"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b", "b c", "c d"))
    assert(out(1).isEmpty && out(2).isEmpty)
    assert(out(3) == Seq("x y"))
  }

  test("topNgrams counts corpus-wide with deterministic tie-break") {
    val df = Seq((1L, "to be or not to be"), (2L, "to be is to do")).toDF("doc_id", "text")
    val top = TextAnalysis.topNgrams(df, "text", n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(top.head == ("to be", 3L))
    assert(top.length == 3)
  }

  test("repetitionSignals flags repeated words and bigrams") {
    val df = Seq(
      (1L, "spam spam spam spam"),   // 1 distinct word, 1 distinct bigram
      (2L, "all words are unique"),
      (3L, "one")                    // no bigrams
    ).toDF("doc_id", "text")
    val by = TextAnalysis.repetitionSignals(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(by(1L).getAs[Double]("dup_word_frac") == 0.75)   // (4-1)/4
    assert(by(1L).getAs[Double]("dup_bigram_frac") > 0.6)   // (3-1)/3
    assert(by(2L).getAs[Double]("dup_word_frac") == 0.0)
    assert(by(2L).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(by(3L).getAs[Double]("dup_bigram_frac") == 0.0)  // guarded empty
    assert(by(3L).getAs[Double]("mean_word_len") == 3.0)
  }

  test("tfIdfTopTerms ranks distinctive terms above ubiquitous ones") {
    val df = Seq(
      (1L, "apple apple banana common"),
      (2L, "cherry common banana"),
      (3L, "durian common")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", k = 2).collect()
    val top1 = out.filter(_.getLong(0) == 1L).minBy(_.getInt(1))
    assert(top1.getAs[String]("term") == "apple") // tf=2, df=1: most distinctive
    // 'common' appears in every doc: idf = ln(1) = 0 everywhere
    assert(out.filter(_.getAs[String]("term") == "common")
      .forall(_.getAs[Double]("tfidf") == 0.0))
    // every doc gets exactly k (or fewer) rows, rank is 1-based dense
    assert(out.groupBy(_.getLong(0)).forall { case (_, rs) =>
      rs.map(_.getInt(1)).sorted.sameElements(1 to rs.length) })
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

  test("topNgramCharFraction measures the dominant bigram's char coverage") {
    val docs = Seq(
      (1L, "spam ham spam ham spam ham"), // "spam ham" x3, len 8, chars 26
      (2L, "all words unique here"),      // every bigram once
      (3L, "   ")                         // blank -> 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.topNgramCharFraction(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    // 3 occurrences x 8 chars / 26 chars = 0.92307... -> 4dp 0.9231
    assert(out(0).getDouble(1) === 0.9231)
    assert(out(1).getDouble(1) < 0.6) // a single occurrence covers < 60%
    assert(out(2).getDouble(1) === 0.0)
  }

  test("compression ratio separates repetitive from varied text, deterministically") {
    import org.apache.spark.sql.functions._
    val rep = ("spam " * 200).trim
    // varied text: no repeated structure at deflate's window scale
    val varied = (0 until 200).map(i => s"w${i * 7919 % 1000}x${i % 13}").mkString(" ")
    val docs = Seq((1L, rep), (2L, varied), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.deflateLen(col("text")).as("d"),
        graft.text.TextAnalysis.compressionRatio(col("text")).as("r"))
      .orderBy("doc_id").collect()
    val repRatio = out(0).getAs[Double]("r")
    val varRatio = out(1).getAs[Double]("r")
    assert(repRatio < 0.05, s"repetitive text should crush: $repRatio")
    assert(varRatio > 0.3, s"varied text should resist: $varRatio")
    assert(out(2).getAs[Int]("d") == 0 && out(2).isNullAt(2)) // empty -> len 0, null ratio
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))          // null -> null
    // deterministic across evaluations (interpreted vs codegen'd paths
    // both call the same static kernel on the same bytes)
    val again = docs.select(
        graft.functions.GraftFunctions.deflateLen(col("text")).as("d"))
      .orderBy("doc_id").collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    assert(again.toSeq == out.map(r => if (r.isNullAt(1)) -1 else r.getAs[Int]("d")).toSeq)
  }
}
