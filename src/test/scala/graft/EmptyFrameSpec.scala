package graft

import graft.dedup.{Components, Duplicates, LlmDedup, MinHash}
import graft.drift.Drift
import graft.impute.{Imputer, Mean, Median, Mode}
import graft.infer.ConfigInference
import graft.normalize.{NormalizeConfig, Normalizer}
import graft.ops.Binning
import graft.outliers.{Clip, Iqr, Outliers, ZScore}
import graft.profile.{Distributions, Profiler}
import graft.quality.{InRange, NotNull, Validator}
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Every operator must tolerate an EMPTY input frame (the reference pins
  * this via test_empty_dataframe_handling): 0-row partitions are routine
  * at scale — an empty filter result, an empty partition of a source —
  * and an operator that throws on them kills the whole job. */
class EmptyFrameSpec extends SparkSpec {
  import spark.implicits._

  private def empty = Seq.empty[(Long, String, Option[Double])]
    .toDF("id", "name", "price")

  test("profiler tolerates empty frames") {
    assert(Profiler.schemaProfile(empty).count() == 3) // one row per column
    assert(Profiler.describe(empty, Seq("price")).count() == 1)
    assert(Profiler.duplicateSummary(empty).count() == 1)
    assert(Profiler.valueCounts(empty, "name").count() == 0)
  }

  test("cleaning operators tolerate empty frames") {
    val (norm, _) = Normalizer(empty, NormalizeConfig(
      standardizeTextColumns = Seq("name"), coerceTypes = Map("price" -> "double")))
    assert(norm.count() == 0)
    assert(Imputer.impute(empty,
      Map("price" -> Median, "name" -> Mode, "id" -> Mean)).count() == 0)
    assert(Duplicates.drop(empty, Seq("name"), Duplicates.KeepFirst,
      Seq(col("id"))).count() == 0)
    val det = Outliers.detect(empty, Map("price" -> Iqr(1.5), "id" -> ZScore(3.0)))
    assert(Outliers.handle(det, Map("price" -> Clip)).count() == 0)
    assert(Outliers.log(det).count() == 2) // one log row per configured column
  }

  test("validation, inference, dedup tolerate empty frames") {
    assert(Validator.summary(empty, Seq(NotNull("name"),
      InRange("price", 0, 10))).count() == 2)
    val cfg = ConfigInference.infer(empty)
    assert(cfg.imputation.isEmpty) // no nulls observed in 0 rows
    assert(cfg.categoricalWhitelists.keySet == Set("name")) // 0 distinct <= threshold
    assert(LlmDedup.exact(empty, "name", "id").count() == 0)
    assert(MinHash.nearDuplicatePairs(empty, "name", "id").count() == 0)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Components.componentLabels(noPairs).count() == 0)
    assert(Components.dedupByComponent(empty, "id", noPairs).count() == 0)
  }

  test("round-4 statistics tolerate empty frames without throwing") {
    // None of these may THROW on 0 rows; they emit empty/null-stat frames.
    assert(Drift.ks(empty, empty, "price").collect()(0).isNullAt(1))
    val psi = Drift.psi(empty, empty, "price", bins = 4).collect()
    assert(psi.length == 4) // bins materialize; stats are NaN/null-safe rows
    assert(Profiler.entropyProfile(empty, Seq("name", "price")).count() == 0)
    assert(Profiler.benford(empty, "price").count() == 0)
    assert(Profiler.association(empty, Seq(("name", "price")))
      .collect()(0).isNullAt(3))
    val rho = Distributions.spearmanMatrix(empty, Seq("id", "price")).collect()
    assert(rho.length == 1 && rho(0).isNullAt(2))
    assert(Binning.equalFrequency(empty, "price", 4, Seq("id")).count() == 0)
    assert(TextAnalysis.tfIdfTopTerms(empty.withColumnRenamed("name", "text"),
      "id", "text").count() == 0)
    assert(TextAnalysis.topNgrams(empty.withColumnRenamed("name", "text"),
      "text", 2, 5).count() == 0)
  }

  test("corpus-curation operators tolerate empty frames") {
    import graft.ops.{Packing, Quota, Sampling, Skew}
    import graft.text.{CorpusOps, Mixture, Vocab}
    val docs = empty.withColumnRenamed("name", "text")
    assert(CorpusOps.segmentDedup(docs, "id", "text").count() == 0)
    assert(CorpusOps.decontaminate(docs, docs, "id", "text").count() == 0)
    assert(CorpusOps.piiSignals(docs, "id", "text").count() == 0)
    assert(TextAnalysis.topNgramCharFraction(docs, "id", "text", 2).count() == 0)
    assert(Sampling.weightedSample(empty, "id", lit(1.0)).count() == 0)
    assert(Sampling.split(empty, "id", Seq("a" -> 0.5, "b" -> 0.5)).count() == 0)
    assert(Quota.capPerGroup(docs, "text", "id", 3).count() == 0)
    assert(Packing.packStats(empty, "name", "id", "price", 512).count() == 0)
    assert(Mixture.plan(docs, "text", "text").count() == 0)
    assert(Vocab.coverage(docs, "text").count() == 0)
    assert(Skew.heavyHitters(empty, "name").count() == 0)
    assert(LlmDedup.incremental(docs, docs, "text", "id").count() == 0)
  }

  test("round-5 operators tolerate empty frames") {
    import graft.dedup.MinHash
    import graft.ops.Layout
    import graft.streaming.StreamOps
    import graft.text.CorpusOps
    val spark2 = spark
    import spark2.implicits._
    val docs = empty.withColumnRenamed("name", "text")
    val nonEmpty = Seq((1L, "some real document text here")).toDF("id", "text")
    // empty corpus and/or empty bench: bloom path must not choke on an
    // expectedNumItems of 0 (clamped to 1) or an empty build side
    assert(CorpusOps.decontaminateBloom(docs, docs, "id", "text").count() == 0)
    assert(CorpusOps.decontaminateBloom(docs, nonEmpty, "id", "text").count() == 0)
    assert(CorpusOps.decontaminateBloom(nonEmpty, docs, "id", "text").count() == 0)
    // empty bench keeps the whole corpus; empty corpus yields nothing
    assert(MinHash.crossNearDuplicatePairs(nonEmpty, docs, "text", "id").count() == 0)
    assert(MinHash.decontaminateNear(nonEmpty, docs, "text", "id").count() == 1)
    assert(MinHash.decontaminateNear(docs, nonEmpty, "text", "id").count() == 0)
    // z-order over an empty frame: bounds row is all-null, zero rows out
    assert(Layout.zorderBy(empty.withColumnRenamed("name", "x"),
      Seq("x", "price")).count() == 0)
    // batch interval join with an empty side
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val evs = Seq((ts, 1L)).toDF("ts", "user_id")
    val noEvs = evs.limit(0)
    assert(StreamOps.intervalJoin(evs, noEvs, Seq("user_id")).count() == 0)
    assert(StreamOps.intervalJoin(noEvs, evs, Seq("user_id")).count() == 0)
  }

  test("r10 operators tolerate empty frames") {
    import graft.sim.Binary
    import graft.ops.{Sharding, TopK, EventAnalytics}
    import graft.quality.GateEval
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Binary.encodeBinary(noVecs, "vec_id", "embedding").count() == 0)
    val coded = Binary.encodeBinary(noVecs, "vec_id", "embedding")
    assert(Binary.hammingTopK(coded, "vec_id", noVecs, "vec_id", "embedding").count() == 0)
    assert(Binary.hammingPairs(coded, "vec_id", maxDist = 3, bands = 4).count() == 0)
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Sharding.shardPlan(noDocs, "doc_id", "text", 8).count() == 0)
    assert(TopK.perGroup(
      Seq.empty[(String, Double, Long)].toDF("g", "v", "id"),
      Seq("g"), "v", "id", 3).count() == 0)
    assert(GateEval.gains(
      Seq.empty[(Double, Long)].toDF("score", "label"), "score", "label")
      .count() == 0)
    assert(graft.text.Vocab.zipf(noDocs, "text", k = 4).count() == 0)
    val noEvents = Seq.empty[(java.sql.Timestamp, Long)].toDF("ts", "user_id")
    assert(EventAnalytics.resample(noEvents, "ts", "hour",
      Some("user_id")).count() == 0)
    assert(graft.text.CorpusOps.diff(noDocs, noDocs, "doc_id", "text").count() == 0)
    // drift divergences: both sides empty -> bins with null totals
    val d = Drift.divergences(
      Seq.empty[Tuple1[Double]].toDF("x"),
      Seq.empty[Tuple1[Double]].toDF("x"), "x", bins = 4).collect()
    assert(d.length == 4 && d.forall(_.isNullAt(d.head.fieldIndex("js_div"))))
  }
}
