package graft

import graft.ops.{Packing, Quota}
import graft.text.{Mixture, Vocab}
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("capPerGroup keeps at most n per group, deterministically") {
    val df = (0L until 100L).map(i => (i, s"g${i % 4}")).toDF("id", "grp")
    val a = Quota.capPerGroup(df, "grp", "id", n = 5).select("id").as[Long].collect().sorted
    val b = Quota.capPerGroup(df, "grp", "id", n = 5).select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
    val byGrp = Quota.capPerGroup(df, "grp", "id", n = 5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp.values.forall(_ === 5L) && byGrp.size === 4)
    // groups smaller than the quota survive whole
    val small = Quota.capPerGroup(df.filter(col("id") < 3), "grp", "id", n = 5)
    assert(small.count() === 3)
  }

  test("packStats bins follow the cumulative token stream per shard") {
    val df = Seq(
      ("s1", 1L, 300L), ("s1", 2L, 300L), ("s1", 3L, 300L), // cum 300,600,900
      ("s2", 4L, 1200L), ("s2", 5L, 10L)
    ).toDF("shard", "id", "tok")
    val out = Packing.packStats(df, "shard", "id", "tok", budget = 512)
      .orderBy("shard", "bin")
      .select("shard", "bin", "n_docs", "n_tokens").as[(String, Long, Long, Long)]
      .collect().toSeq
    // s1: doc1 starts at 0 (bin 0), doc2 at 300 (bin 0), doc3 at 600 (bin 1)
    // s2: doc4 starts at 0 (bin 0), doc5 at 1200 (bin 2)
    assert(out === Seq(("s1", 0L, 2L, 600L), ("s1", 1L, 1L, 300L),
      ("s2", 0L, 1L, 1200L), ("s2", 2L, 1L, 10L)))
  }

  test("mixture plan shares sum to 1 and rates cap at 1") {
    val docs = Seq(
      ("a", "one two three four"), ("a", "five six"),
      ("b", "seven eight")).toDF("source", "text")
    val out = Mixture.plan(docs, "source", "text", budgetFrac = 0.5)
      .orderBy("source").collect()
    val shares = out.map(_.getAs[Double]("token_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-6)
    // a: 6 tokens of 8; b: 2 of 8. budget/src = 0.5*8/2 = 2 tokens.
    assert(math.abs(out(0).getAs[Double]("sample_rate") - 2.0 / 6.0) < 1e-6)
    assert(out(1).getAs[Double]("sample_rate") === 1.0) // capped
  }

  test("mixture plan reports 0 for an all-blank source, not Infinity-as-1.0") {
    val docs = Seq(
      ("a", "hello world tokens here"), ("b", "   "), ("b", "")
    ).toDF("source", "text")
    val out = Mixture.plan(docs, "source", "text", budgetFrac = 0.5)
      .orderBy("source").collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Double]("token_share"), r.getAs[Double]("sample_rate")))).toMap
    assert(out("b") == ((0.0, 0.0)), "degenerate source must surface as 0, not 1.0")
    assert(out("a")._1 == 1.0)
  }

  test("temperature plan: alpha flattens toward uniform, degenerates at 1") {
    // 90/10 token split across two sources (9x "w" docs vs 1)
    def doc(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val df = Seq(("a", doc(90)), ("b", doc(10))).toDF("source", "text")
    def planOf(alpha: Double) = Mixture.temperaturePlan(
        df, "source", "text", alpha = alpha, budgetFrac = 0.5)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("token_share"), r.getAs[Double]("weight"),
          r.getAs[Double]("sample_rate"))).toMap
    // alpha = 1: weights are the natural shares (0.9 + 0.1 sums exactly)
    val nat = planOf(1.0)
    assert(nat("a")._2 == 0.9 && nat("b")._2 == 0.1)
    // alpha = 0: uniform weights regardless of size
    val uni = planOf(0.0)
    assert(uni("a")._2 == 0.5 && uni("b")._2 == 0.5)
    // alpha = 0.3: strictly between natural and uniform — the low-resource
    // source up-samples (weight above its share, rate above natural rate)
    val t = planOf(0.3)
    assert(t("b")._2 > 0.1 && t("b")._2 < 0.5)
    assert(t("a")._2 < 0.9 && t("a")._2 > 0.5)
    assert(t("b")._3 > nat("b")._3)
    // weights always sum to ~1
    assert(math.abs(t.values.map(_._2).sum - 1.0) < 1e-5)
    // refusals
    intercept[IllegalArgumentException] {
      Mixture.temperaturePlan(df, "source", "text", alpha = 1.5) }
    intercept[IllegalArgumentException] {
      Mixture.temperaturePlan(df, "source", "text", budgetFrac = 0.0) }
  }

  test("collocations: hand-computed PMI on a planted phrase, floor, refusals") {
    // "new york" appears 6 times; each word only inside the phrase plus
    // filler tokens keep totals round. Docs: 6 x "new york", 12 fillers.
    val docs = (1 to 6).map(_ => "new york").toDF("text")
      .unionByName((1 to 6).map(_ => "aa bb").toDF("text"))
    val out = graft.text.Vocab.collocations(docs, "text", minCount = 5, k = 10)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // N1 = 24 unigrams, N2 = 12 bigrams; c(new york)=6, c(new)=c(york)=6
    // ratio = (6/12) / ((6/24)*(6/24)) = 8 -> pmi = ln(8) rounded 6dp
    val expected = math.floor(math.log(8.0) * 1e6 + 0.5) / 1e6
    assert(out("new york") == ((6L, 6L, 6L, expected)))
    assert(out.contains("aa bb") && out.size == 2)
    // floor: raising minCount above 6 drops everything
    assert(graft.text.Vocab.collocations(docs, "text", minCount = 7, k = 10)
      .count() == 0L)
    intercept[IllegalArgumentException] {
      graft.text.Vocab.collocations(docs, "text", minCount = 0)
    }
    intercept[IllegalArgumentException] {
      graft.text.Vocab.collocations(docs, "text", k = 0)
    }
  }

  test("vocab coverage is ranked, cumulative, and ends below or at 1") {
    val docs = Seq("a a a b b c", "a b d").map(Tuple1(_)).toDF("text")
    val out = Vocab.coverage(docs, "text", k = 3).orderBy("rank").collect()
    assert(out.map(_.getAs[String]("term")).toSeq === Seq("a", "b", "c"))
    assert(out.map(_.getAs[Long]("cnt")).toSeq === Seq(4L, 3L, 1L))
    val cums = out.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.drop(1)).forall { case (x, y) => x <= y })
    assert(math.abs(cums(0) - 4.0 / 9.0) < 1e-6)
    assert(cums.last <= 1.0)
  }

  test("keywordsChi2: hand-computed contingency, minDf cap, tie order") {
    import spark.implicits._
    // sources: A has 4 docs, B has 4 docs. 'alpha' appears in all 4 A
    // docs and 1 B doc (df 5 clears minDf=5); 'common' in every doc
    // (chi2 = 0, den>0? a=4,b=4,c=0,d=0 -> den 0 -> dropped).
    val docs = (
      (1 to 4).map(i => ("A", s"alpha common filler$i")) ++
      Seq(("B", "alpha common x y"), ("B", "common p q"),
          ("B", "common r s"), ("B", "common t u"))
    ).toDF("source", "text")
    val out = graft.text.Vocab.keywordsChi2(docs, "source", "text",
        k = 3, minDf = 5)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    // alpha in A: a=4 b=1 c=0 d=3, N=8 -> chi2 = 8*(12-0)^2/(5*3*4*4)=4.8
    val aAlpha = out.find(t => t._1 == "A" && t._2 == "alpha").get
    assert(aAlpha._3 == 4 && aAlpha._4 == 1 && aAlpha._5 == 4.8)
    // 'common' (den = 0) must not appear anywhere
    assert(!out.exists(_._2 == "common"))
    // rare terms below minDf never appear
    assert(!out.exists(_._2.startsWith("filler")))
    intercept[IllegalArgumentException] {
      graft.text.Vocab.keywordsChi2(docs, "source", "text", k = 0)
    }
  }
}
