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

  test("rbo: identical ranking hits the 1 - p^D closed form; disjoint is 0") {
    // distinct counts per term so the ranking is unambiguous
    val a = Seq.tabulate(5)(i => Seq.fill(5 - i)(s"t$i").mkString(" "))
      .toDF("text")
    val same = VocabDrift.rbo(a, a, "text", p = 0.9, depth = 5).collect()(0)
    // identical top-D lists: RBO_trunc = (1-p) * sum p^(d-1) = 1 - p^D
    assert(same.getAs[Long]("n_common") == 5)
    assert(math.abs(same.getAs[Double]("rbo") - (1 - math.pow(0.9, 5))) < 1e-6)
    val b = Seq.tabulate(5)(i => Seq.fill(5 - i)(s"u$i").mkString(" "))
      .toDF("text")
    val disj = VocabDrift.rbo(a, b, "text", p = 0.9, depth = 5).collect()(0)
    assert(disj.getAs[Long]("n_common") == 0 && disj.getAs[Double]("rbo") == 0.0)
    // a swap NEAR THE TOP costs more than the same swap deeper down:
    // swap ranks 1,2 vs swap ranks 4,5
    val topSwap = Seq(5 -> "t1", 4 -> "t0", 3 -> "t2", 2 -> "t3", 1 -> "t4")
      .map { case (n, t) => Seq.fill(n)(t).mkString(" ") }.toDF("text")
    val deepSwap = Seq(5 -> "t0", 4 -> "t1", 3 -> "t2", 2 -> "t4", 1 -> "t3")
      .map { case (n, t) => Seq.fill(n)(t).mkString(" ") }.toDF("text")
    val rTop = VocabDrift.rbo(a, topSwap, "text", p = 0.9, depth = 5)
      .collect()(0).getAs[Double]("rbo")
    val rDeep = VocabDrift.rbo(a, deepSwap, "text", p = 0.9, depth = 5)
      .collect()(0).getAs[Double]("rbo")
    assert(rTop < rDeep, s"top swap $rTop should cost more than deep $rDeep")
    intercept[IllegalArgumentException](
      VocabDrift.rbo(a, a, "text", p = 1.0))
    intercept[IllegalArgumentException](
      VocabDrift.rbo(a, a, "text", depth = 0))
  }
}
