package graft

import graft.normalize._

class NormalizerSpec extends SparkSpec {
  import spark.implicits._

  test("full pass applies rename, text, mapping, cast in order") {
    val df = Seq(("  Foo ", "A", "12"), ("BAR", "B", "x")).toDF("name", "code", "num")
    val (out, log) = Normalizer(df, NormalizeConfig(
      renameColumns = Map("name" -> "label"),
      standardizeTextColumns = Seq("label"),
      valueMappings = Map("code" -> Map("A" -> "alpha")),
      coerceTypes = Map("num" -> "int")))
    val rows = out.orderBy("label").collect()
    assert(rows(0).getString(0) == "bar")
    assert(rows(1).getString(0) == "foo")
    assert(rows(0).getString(1) == "B")
    assert(rows(1).getString(1) == "alpha")
    assert(rows(0).isNullAt(2))          // "x" -> null via try_cast
    assert(rows(1).getInt(2) == 12)
    assert(log.count() == 4)
  }

  test("mapValues maps the null sentinel") {
    val df = Seq(Some("F"), None, Some("Z")).toDF("s")
    val (out, _) = Normalizer(df, NormalizeConfig(
      valueMappings = Map("s" -> Map("F" -> "fin", "null" -> "unk"))))
    assert(out.collect().map(_.getString(0)).toSet == Set("fin", "unk", "Z"))
  }

  test("fuzzyCorrect heals near-matches but leaves far values") {
    val df = Seq("BUILDINGx", "AUTOMOBILE", "zzz").toDF("seg")
    val out = Normalizer.fuzzyCorrect(df, "seg",
      FuzzySpec(Seq("AUTOMOBILE", "BUILDING"), cutoff = 80.0))
    assert(out.collect().map(_.getString(0)).toSet ==
      Set("BUILDING", "AUTOMOBILE", "zzz"))
  }

  test("fuzzyCorrect is token-order-aware: 'smith john' heals to 'john smith'") {
    val df = Seq("smith john", "smith jon", "totally different").toDF("name")
    val out = Normalizer.fuzzyCorrect(df, "name",
      FuzzySpec(Seq("john smith"), cutoff = 85.0))
    assert(out.collect().map(_.getString(0)).toSet ==
      Set("john smith", "totally different"))
    // plain Levenshtein alone scores the reordering below cutoff
    val plain = Normalizer.fuzzyCorrect(df, "name",
      FuzzySpec(Seq("john smith"), cutoff = 85.0, tokenSort = false))
    assert(plain.collect().map(_.getString(0)).toSet ==
      Set("smith john", "smith jon", "totally different"))
  }

  test("fuzzyCorrect partial-ratio heals substring containment (WRatio tier)") {
    // "acme corp" vs "acme corporation ltd": plain = 45, token-sorted = 45,
    // but the best 9-char window of the master IS "acme corp" →
    // 0.9 × 100 = 90 ≥ cutoff. Without partialRatio the value must survive
    // uncorrected, and an unrelated master must not claim it.
    val df = Seq("acme corp", "something else entirely").toDF("name")
    val master = Seq("acme corporation ltd", "zenith industrial co")
    val healed = Normalizer.fuzzyCorrect(df, "name",
      FuzzySpec(master, cutoff = 85.0, partialRatio = true))
    assert(healed.collect().map(_.getString(0)).toSet ==
      Set("acme corporation ltd", "something else entirely"))
    val without = Normalizer.fuzzyCorrect(df, "name",
      FuzzySpec(master, cutoff = 85.0))
    assert(without.collect().map(_.getString(0)).toSet ==
      Set("acme corp", "something else entirely"))
  }

  test("parseDatetime falls back across formats and coerces failures") {
    val df = Seq("2020/01/02", "03-04-2021", "junk").toDF("d")
    val (out, _) = Normalizer(df, NormalizeConfig(
      parseDatetimes = Map("d" -> Seq("yyyy/MM/dd", "MM-dd-yyyy"))))
    val vals = out.collect().map(r => Option(r.getTimestamp(0)).map(_.toString))
    assert(vals.flatten.count(_.startsWith("2020-01-02")) == 1)
    assert(vals.flatten.count(_.startsWith("2021-03-04")) == 1)
    assert(vals.count(_.isEmpty) == 1)
  }
}
