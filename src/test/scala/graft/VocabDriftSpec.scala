package graft

import org.apache.spark.sql.functions._

import graft.drift.VocabDrift

/** Pins for vocabulary drift (SURVEY §2 row 160): hand-computed smoothed
  * probabilities / log-ratios / PSI terms on a planted fixture,
  * vanished/appeared term handling, top-K tie order, refusals. */
class VocabDriftSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed fixture: shifted, vanished and appeared terms") {
    // old = {alpha:1, beta:2} (t=3), new = {alpha:1, gamma:1} (t=2),
    // union V = 3, smooth 1:
    //   p_old(x) = (c+1)/6, p_new(x) = (c+1)/5
    val oldDf = Seq("alpha beta beta").toDF("text")
    val newDf = Seq("alpha gamma").toDF("text")
    val rows = VocabDrift.vocabDrift(oldDf, newDf, "text", topK = 10)
      .orderBy("term").collect()
      .map(r => r.getString(0) -> r).toMap
    def d(x: Double, n: Int) = math.floor(x * math.pow(10, n) + 0.5) / math.pow(10, n)

    val a = rows("alpha") // 2/6 vs 2/5
    assert(a.getDouble(3) == d(2.0 / 6, 8) && a.getDouble(4) == d(2.0 / 5, 8))
    assert(a.getDouble(5) == d(math.log((2.0 / 5) / (2.0 / 6)), 6))

    val b = rows("beta") // 3/6 vs 1/5 — vanished mass, negative ratio
    assert(b.getLong(1) == 2L && b.getLong(2) == 0L)
    assert(b.getDouble(5) == d(math.log((1.0 / 5) / (3.0 / 6)), 6))
    assert(b.getDouble(6) ==
      d((1.0 / 5 - 3.0 / 6) * math.log((1.0 / 5) / (3.0 / 6)), 6))
    assert(b.getDouble(6) > 0, "a vanished term contributes positive PSI")

    val g = rows("gamma") // appeared: 1/6 vs 2/5
    assert(g.getLong(1) == 0L && g.getLong(2) == 1L)
    assert(g.getDouble(5) > 0)
  }

  test("top-K keeps the heaviest combined terms, term-asc on ties") {
    val oldDf = Seq("x x x y z").toDF("text")
    val newDf = Seq("y w").toDF("text")
    // combined: x=3, y=2, z=1, w=1 → topK=3 keeps x, y, then tie z/w →
    // term asc keeps w
    val terms = VocabDrift.vocabDrift(oldDf, newDf, "text", topK = 3)
      .select("term").as[String].collect().toSet
    assert(terms == Set("x", "y", "w"))
  }

  test("identical snapshots: zero log-ratios only when totals match") {
    val df = Seq("a b c a").toDF("text")
    val out = VocabDrift.vocabDrift(df, df, "text", topK = 10)
      .collect()
    assert(out.forall(_.getDouble(5) == 0.0))
    assert(out.forall(_.getDouble(6) == 0.0))
  }

  test("refusals") {
    val df = Seq("a").toDF("text")
    intercept[IllegalArgumentException](
      VocabDrift.vocabDrift(df, df, "text", topK = 0))
    intercept[IllegalArgumentException](
      VocabDrift.vocabDrift(df, df, "text", smooth = 0))
  }
}
