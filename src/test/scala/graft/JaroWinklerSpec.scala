package graft

import graft.functions.JaroWinkler
import org.apache.spark.sql.functions._

class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  // Expected values pinned against DuckDB's jaro_winkler_similarity (the
  // oracle engine), which applies the Winkler boost only above jaro 0.7.
  private val pinned = Seq(
    ("MARTHA", "MARHTA", 0.9611111111111111),
    ("DIXON", "DICKSONX", 0.8133333333333332),
    ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
    ("smith john", "john smith", 0.5333333333333333),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0),
    ("DwAyNE", "DuANE", 0.8400000000000001),
    ("arnab", "aranb", 0.9466666666666665),
    ("ABCVWXYZ", "CABVWXYZ", 0.9583333333333334),
    ("abcdzzzz", "abcdyyyy", 0.6666666666666666), // jaro <= 0.7: no boost
    ("ab", "ba", 0.0),                            // window 0, no matches
    ("abcd", "badc", 0.8333333333333334))         // transposition counting

  test("similarity kernel matches DuckDB semantics") {
    pinned.foreach { case (a, b, want) =>
      assert(math.abs(JaroWinkler.similarity(a, b) - want) < 1e-12,
        s"jw($a, $b)")
      assert(math.abs(JaroWinkler.similarity(b, a) - want) < 1e-12,
        s"jw($b, $a) symmetric")
    }
  }

  test("column expression evaluates under codegen and handles nulls") {
    val df = pinned.map { case (a, b, w) => (a, b, w) }
      .toDF("a", "b", "want")
    val rows = df.select(
      JaroWinkler.jaroWinkler(col("a"), col("b")).as("got"), col("want")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    val withNull = Seq(("x", Option.empty[String])).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b"))).collect()
    assert(withNull.head.isNullAt(0))
  }
}
