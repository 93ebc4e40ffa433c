package graft

import graft.ops.Sampling
import graft.sim.SemDedup
import graft.text.CorpusOps
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("segmentDedup removes recurring segments, keeps first occurrence") {
    // doc 1: 20 tokens (segments s0 s1); doc 2 repeats doc 1's first
    // segment then adds 10 unique tokens; doc 3 is fully unique.
    val seg = (c: Char) => (0 until 10).map(i => s"$c$i").mkString(" ")
    val docs = Seq(
      (1L, seg('a') + " " + seg('b')),
      (2L, seg('a') + " " + seg('c')),
      (3L, seg('d'))).toDF("doc_id", "text")
    val out = CorpusOps.segmentDedup(docs, "doc_id", "text", window = 10)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 1L, 1L)))
    // doc 2's kept content is exactly its unique second segment
    val hashC = CorpusOps.segmentDedup(Seq((9L, seg('c'))).toDF("doc_id", "text"),
      "doc_id", "text", window = 10).select("kept_hash").as[String].head()
    assert(out(1).getString(3) === hashC)
  }

  test("segmentDedup keeps a partial trailing segment and skips blank docs") {
    val docs = Seq((1L, "x0 x1 x2"), (2L, "   ")).toDF("doc_id", "text")
    val out = CorpusOps.segmentDedup(docs, "doc_id", "text", window = 2)
      .orderBy("doc_id").collect()
    assert(out.length === 1) // blank doc has no tokens, so no row
    assert((out(0).getLong(1), out(0).getLong(2)) === ((2L, 2L)))
  }

  test("segmentDedup fails loudly when the rank precondition is violated") {
    // id beyond Long.MaxValue/SegRank would overflow the packed rank
    val docs = Seq((Long.MaxValue / 100L, "a b c")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      CorpusOps.segmentDedup(docs, "doc_id", "text", window = 2).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("precondition")),
      s"expected precondition failure, got: $msgs")
  }

  test("containmentPairs: excerpt scores 1.0 in its parent, asymmetric, df-capped") {
    val words = (1 to 40).map(i => s"w$i")
    val parent = words.mkString(" ")             // 40 tokens
    val excerpt = words.take(12).mkString(" ")   // 5 8-grams, all in parent
    val other = (100 to 140).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, parent), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val out = CorpusOps.containmentPairs(docs, "doc_id", "text",
        n = 8, maxDf = 1000, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4)))
    // exactly the asymmetric direction: excerpt (2) contained in parent (1)
    assert(out.toSeq == Seq((2L, 1L, 5L, 5L, 1.0)))
    // the reverse direction scores 5/33 and is cut by the threshold;
    // lowering it surfaces the pair with the exact asymmetric ratio
    val both = CorpusOps.containmentPairs(docs, "doc_id", "text",
        n = 8, maxDf = 1000, threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(both((1L, 2L)) == math.floor(5.0 / 33.0 * 1e6 + 0.5) / 1e6)
    // df-cap: a gram shared by all three docs is dropped before pairing
    val boiler = "common boiler plate gram shared by every doc here"
    val capped = CorpusOps.containmentPairs(
      Seq((1L, boiler), (2L, boiler), (3L, boiler)).toDF("doc_id", "text"),
      "doc_id", "text", n = 8, maxDf = 2, threshold = 0.1)
    assert(capped.count() == 0L)
    // short docs (< n tokens) have no grams and pair with nothing
    val short = CorpusOps.containmentPairs(
      Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text"),
      "doc_id", "text", n = 8, maxDf = 10, threshold = 0.1)
    assert(short.count() == 0L)
    // refusals
    intercept[IllegalArgumentException] {
      CorpusOps.containmentPairs(docs, "doc_id", "text", n = 0)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.containmentPairs(docs, "doc_id", "text", maxDf = 1)
    }
    intercept[IllegalArgumentException] {
      CorpusOps.containmentPairs(docs, "doc_id", "text", threshold = 0.0)
    }
  }

  test("decontaminate counts distinct shared n-grams per corpus doc") {
    val bench = Seq((100L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx one two three four five six seven eight nine yy"), // 2 shared 8-grams
      (2L, "totally different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val out = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", n = 8)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
  }

  test("overlapFraction grades every doc, zero-overlap and short docs included") {
    val bench = Seq((100L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "xx one two three four five six seven eight nine yy"), // 4 grams, 2 shared
      (2L, "totally different words with no overlap at all here"), // 2 grams, 0 shared
      (3L, "one two three four five six seven eight"),             // 1 gram, fully shared
      (4L, "short"))                                               // < n tokens: 0 grams
      .toDF("doc_id", "text")
    val out = CorpusOps.overlapFraction(corpus, bench, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 4L, 2L), (2L, 2L, 0L), (3L, 1L, 1L), (4L, 0L, 0L)))
    assert(out.map(_.getDouble(3)).toSeq === Seq(0.5, 0.0, 1.0, 0.0))
    // the binary path is exactly the frac > 0 threshold on this audit
    val binary = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    val graded = out.filter(_.getDouble(3) > 0).map(_.getLong(0)).toSet
    assert(binary === graded)
  }

  test("decontaminateBloom is value-identical to exact at any fpp") {
    // 60 docs, every 6th contaminated with a shared 9-token span
    val span = (0 until 9).map(i => s"s$i").mkString(" ")
    val corpus = (1L to 60L).map { i =>
      val base = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
      (i, if (i % 6 == 0) s"$base $span" else base)
    }.toDF("doc_id", "text")
    val bench = Seq((1000L, span)).toDF("doc_id", "text")
    val exact = CorpusOps.decontaminate(corpus, bench, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect().toSeq
    // fpp only tunes shuffle reduction — a coarse 0.5 and a tight 1e-6
    // must both reproduce the exact result bit-for-bit
    for (fpp <- Seq(0.5, 1e-6)) {
      val bloom = CorpusOps.decontaminateBloom(corpus, bench, "doc_id", "text",
        n = 8, fpp = fpp).orderBy("doc_id").collect().toSeq
      assert(bloom === exact, s"fpp=$fpp diverged from exact")
    }
    assert(exact.map(_.getLong(0)) === (6L to 60L by 6L))
    assert(exact.forall(_.getLong(1) === 2L)) // 9 tokens → two distinct 8-grams
  }

  test("decontaminateBloom probes before the gram shuffle (plan pin)") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    val corpus = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val bench = Seq((2L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = CorpusOps.decontaminateBloom(corpus, bench, "doc_id", "text")
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan // unwrap AQE
        case p => p
      }
    // the probe filter must survive optimization, sitting BELOW every
    // exchange (its subtree shuffle-free) — that's the whole point: only
    // might-contain grams reach the distinct's exchange
    val probes = plan.collect {
      case f: FilterExec if f.condition.toString.contains("bloom_might_contain") => f
    }
    assert(probes.nonEmpty, s"no bloom probe filter in:\n$plan")
    val shuffleBelow = probes.exists(_.collect { case e: Exchange => e }.nonEmpty)
    assert(!shuffleBelow, s"bloom probe sits above an exchange:\n$plan")
  }

  test("piiSignals counts and redacts email, ip, ssn") {
    val docs = Seq(
      (1L, "mail a@b.co and c.d-e@f.org ip 10.0.0.1 ssn 123-45-6789"),
      (2L, "clean text, no pii 1234 5.5")).toDF("doc_id", "text")
    val out = CorpusOps.piiSignals(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert((out(0).getInt(1), out(0).getInt(2), out(0).getInt(3)) === ((2, 1, 1)))
    assert((out(1).getInt(1), out(1).getInt(2), out(1).getInt(3)) === ((0, 0, 0)))
    val red = docs.select(CorpusOps.redact(col("text")).as("r"))
      .orderBy("r").as[String].collect()
    assert(red.contains("mail <EMAIL> and <EMAIL> ip <IP> ssn <SSN>"))
  }

  test("piiSignalsV2 adds phone + Luhn-gated PAN; invalid checksum survives") {
    val docs = Seq(
      (1L, "call +1-415-555-0123 or (212) 555-9876 card 4111111111111111"),
      (2L, "ref 4111111111111112 ok card 5500005555555559"),
      (3L, "mail a@b.co ip 10.0.0.1 ssn 123-45-6789 plain 12345678901234567"))
      .toDF("doc_id", "text")
    val out = CorpusOps.piiSignalsV2(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: two phones (both formats), one valid PAN
    assert((out(0).getInt(4), out(0).getInt(5)) === ((2, 1)))
    // doc 2: the Luhn-failing run counts 0; the valid MasterCard counts 1
    assert((out(1).getInt(4), out(1).getInt(5)) === ((0, 1)))
    // doc 3: v1 trio intact; the 17-digit run is no PAN candidate at all
    assert((out(2).getInt(1), out(2).getInt(2), out(2).getInt(3),
      out(2).getInt(5)) === ((1, 1, 1, 0)))
    val red = docs.select(CorpusOps.redactV2(col("text")).as("r"))
      .as[String].collect()
    assert(red(0) === "call <PHONE> or <PHONE> card <PAN>")
    // checksum-failing 16-digit run is untouched; the valid one redacts
    assert(red(1) === "ref 4111111111111112 ok card <PAN>")
    assert(red(2) === "mail <EMAIL> ip <IP> ssn <SSN> plain 12345678901234567")
  }

  test("semantic dedup drops scaled clones, keeps originals") {
    // 20 well-separated random-ish vectors + scaled clones of 5 of them
    val rnd = new scala.util.Random(7)
    val base = (0 until 20).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() - 0.5f)))
    val clones = base.take(5).map { case (id, v) => (id + 1000L, v.map(_ * 2.0f)) }
    val df = (base ++ clones).toDF("vec_id", "embedding")
    val kept = SemDedup.dedup(df, "vec_id", "embedding", k = 4, threshold = 0.999)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.toSeq === (0L until 20L))
  }

  test("multi-probe pairs recover a near-pair split across a cell boundary") {
    // Two ADJACENT direction clusters A (ids 0-9) and B (10-19), cosine
    // ~0.98 apart, plus a far cluster C (20-29). With k=3 the quantizer
    // separates A and B, so probes=1 can never emit an A-B pair; probes=2
    // reaches the neighbouring cell and must recover them. Each pair is
    // scored exactly once (dedup before the cosine).
    def cluster(ids: Range, dir: Array[Float]) = ids.map { i =>
      (i.toLong, dir.zipWithIndex.map { case (x, d) =>
        x + math.sin(i * 8 + d).toFloat * 0.05f })
    }
    val a = cluster(0 until 10, Array(10f, 0.1f, 0.1f, 0.1f, 0.1f, 0.1f, 0.1f, 0.1f))
    val b = cluster(10 until 20, Array(10f, 2.0f, 0.1f, 0.1f, 0.1f, 0.1f, 0.1f, 0.1f))
    val c = cluster(20 until 30, Array(0.1f, 0.1f, 10f, 0.1f, 0.1f, 0.1f, 0.1f, 0.1f))
    val df = (a ++ b ++ c).toDF("vec_id", "embedding")
    val index = graft.sim.Ivf.train(df, "vec_id", "embedding", k = 3, iters = 4)
    // premise: A and B landed in different cells (else the test is vacuous)
    val cellsAB = index.indexed.filter(col("_gf_id") < 20)
      .select("_gf_cid", "_gf_id").collect()
      .groupBy(_.getLong(1) < 10).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert((cellsAB(true) intersect cellsAB(false)).isEmpty,
      s"fixture must quantize A and B apart, got $cellsAB")
    def crossPairs(p: Int) = SemDedup.pairs(index, threshold = 0.97, probes = p)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (x, y) => x < 10 && y >= 10 && y < 20 }
    assert(crossPairs(1).isEmpty, "single-probe cannot see across the boundary")
    val recovered = crossPairs(2)
    assert(recovered.nonEmpty, "probes=2 must recover cross-boundary pairs")
    assert(recovered.length == recovered.distinct.length, "each pair scored once")
  }

  test("dedup_semantic benchmark query removes every planted clone") {
    // The registered query plants scaled clones (vec_id + 100000, same
    // direction). Cosine IVF assignment is scale-invariant, so a clone
    // always lands in its original's cell and must always be dropped.
    val kept = SparkEntry.queries("dedup_semantic")(spark, sfDir)
      .as[Long].collect()
    assert(kept.forall(_ < 100000L), "no clone id may survive")
    val orig = Tables.embeddings(spark, sfDir).count()
    assert(kept.length == orig,
      s"kept ${kept.length} of $orig originals — an original was wrongly dropped")
  }

  test("semantic decontamination flags exactly the planted embedding clones") {
    // Both routes (IVF production + handed-plane twin) must flag every
    // vec_id % 10 == 1 corpus item (a 2x clone of the preceding bench
    // vector) and nothing else, each matched to its source bench id.
    val planted = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 10 === 1).select("vec_id").as[Long].collect().sorted
    for (name <- Seq("decontaminate_semantic", "decontaminate_semantic_handed")) {
      val out = SparkEntry.queries(name)(spark, sfDir)
        .select("vec_id", "bench_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(out.map(_._1).toSeq === planted.toSeq, s"$name flagged set")
      assert(out.forall { case (id, bid) => bid === id - 1 }, s"$name best match")
    }
  }

  test("weightedSample keeps everything at weight 1, nothing at 0 or null") {
    val df = (0L until 100L).map(i => (i, if (i < 50) 1.0 else 0.0))
      .toDF("id", "w")
    assert(Sampling.weightedSample(df, "id", col("w")).count() === 50)
    assert(Sampling.weightedSample(df, "id", lit(1.0)).count() === 100)
    assert(Sampling.weightedSample(df, "id", lit(null).cast("double")).count() === 0)
    // out-of-range weights clamp instead of misbehaving
    assert(Sampling.weightedSample(df, "id", lit(7.5)).count() === 100)
    assert(Sampling.weightedSample(df, "id", lit(-3.0)).count() === 0)
  }

  test("weightedSample at 0.3 keeps roughly 30% deterministically") {
    val df = (0L until 1000L).toDF("id")
    val n1 = Sampling.weightedSample(df, "id", lit(0.3)).count()
    val n2 = Sampling.weightedSample(df, "id", lit(0.3)).count()
    assert(n1 === n2)
    assert(n1 > 200 && n1 < 400, s"kept $n1 of 1000 at weight 0.3")
  }
}
