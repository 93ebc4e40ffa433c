package graft

import org.apache.spark.sql.execution.SimpleMode

/** Plan-quality regressions: the properties that make these operators
  * survive a 100 TB scale-up, asserted against the optimized physical
  * plans so a refactor can't silently lose them. */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String = {
    // Pins inspect the operator's OWN plan shape: drop any cached
    // relations a previously-run suite left behind, or a scan-count pin
    // sees InMemoryTableScan instead of the parquet scan (order-dependent
    // flake, observed once under the full suite).
    spark.sharedState.cacheManager.clearCache()
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(SimpleMode)
  }

  test("q3_join broadcasts every dimension (no sort-merge join)") {
    val p = plan("q3_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q3_join prunes lineitem scan to the 3 needed columns") {
    val p = plan("q3_join")
    val readSchema = p.linesIterator.find(l =>
      l.contains("ReadSchema") && l.contains("l_orderkey")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_partkey"))
  }

  test("validate_range pushes the scan down to 2 columns") {
    val p = plan("validate_range")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_totalprice"))
    assert(!readSchema.contains("o_orderdate"))
  }

  test("fuzzy correction broadcasts the correction map (no fact shuffle join)") {
    val p = plan("normalize_fuzzy")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("outlier detection broadcasts the 1-row bounds (nested-loop on 1 row, no fact shuffle)") {
    val p = plan("outliers_iqr")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("exact IQR bounds ride the value histogram, not a percentile row buffer") {
    // the r12 contract: the exact lane's only state is domain-sized — a
    // percentile() aggregate (which buffers EVERY row per group) in the
    // plan means the histogram path was silently lost
    Seq("outliers_iqr", "outliers_iqr_by", "outliers_clip",
        "outliers_replace_median", "outliers_drop", "outliers_log").foreach {
      q => assert(!plan(q).contains("percentile("),
        s"$q plan buffers rows in percentile()")
    }
  }

  test("winsorize ranks over the bounded histogram — no corpus-row window") {
    val p = plan("outliers_winsorize")
    assert(!p.contains("row_number"),
      "winsorize regressed to a corpus-row row_number sort")
    // the rank lookup's window input is the distinct-value histogram: an
    // aggregate must run BEFORE any Window operator in the plan
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window")
    assert(aggIdx >= 0 && winIdx >= 0,
      s"expected both aggregate and window in plan")
  }

  test("q1_agg aggregates map-side before the shuffle (partial + final HashAggregate)") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    // raw rows never shuffle: the only row Exchanges are the tiny grouped
    // state and the final ordering
    assert(p.contains("Exchange hashpartitioning(l_returnflag"))
  }

  test("infer_configs plan has no Expand (approx distinct, not multi-count_distinct)") {
    val p = plan("infer_configs")
    assert(!p.contains("Expand"))
  }

  test("profile_describe is one aggregation pass with map-side partials") {
    val p = plan("profile_describe")
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r.findAllIn(p).size >= 2)
  }

  test("dedup_exact never shuffles the text column (dropped before the groupBy)") {
    val p = plan("dedup_exact")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text"))
  }

  test("hash sampling is a pure scan predicate (no shuffle before the filter)") {
    val p = plan("sample_hash")
    // only the final orderBy may exchange; the sample itself is a Filter
    assert(p.contains("Filter"))
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("curation chain has no cartesian product anywhere") {
    val p = plan("llm_curation_chain")
    assert(!p.contains("CartesianProduct"))
  }

  test("profile_entropy profiles every column through ONE row-level shuffle") {
    val p = plan("profile_entropy")
    assert("Scan parquet".r.findAllIn(p).size == 1)
    // exchanges: (column,value) aggregate state, per-column rollup, final
    // sort — the first is the only one carrying value-level rows, and the
    // partial HashAggregate sits before it
    assert(p.contains("Exchange hashpartitioning(column_name"))
  }

  test("events_rolling computes all three frames over ONE window shuffle+sort") {
    val p = plan("events_rolling")
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert("\\bWindow\\b".r.findAllIn(p).size == 1, "frames share one Window node")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
  }

  test("drift_psi: three pruned scans, broadcast bounds, no row-level join") {
    val p = plan("drift_psi")
    assert("Scan parquet".r.findAllIn(p).size == 3)
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"))
  }

  test("text_tfidf: term aggregations are partial'd map-side before shuffling") {
    val p = plan("text_tfidf")
    assert("Scan parquet".r.findAllIn(p).size <= 3) // tf, df, corpus-N passes
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Exchange hashpartitioning(doc_id"))
  }

  test("dedup_segments: frequency shuffle keyed on the 64-bit hash, not segment text") {
    val p = plan("dedup_segments")
    // the count aggregation exchanges on _gf_h (8-byte key); segment text
    // rides only the per-doc reassembly exchange
    assert(p.contains("Exchange hashpartitioning(_gf_h"))
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2,
      "map-side partial aggregation present")
  }

  test("decontaminate: no cartesian product; gram join is equi (broadcast or SMJ)") {
    val p = plan("decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("text_pii is a pure projection: no shuffle except the final sort") {
    val p = plan("text_pii")
    assert(!p.contains("Exchange hashpartitioning"))
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("sample_weighted is a pure scan predicate (no shuffle before the filter)") {
    val p = plan("sample_weighted")
    assert(p.contains("Filter"))
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("sample_quota: one row-level shuffle (on the group key) feeds the window") {
    val p = plan("sample_quota")
    assert(p.contains("Exchange hashpartitioning(source"))
    assert("\\bWindow\\b".r.findAllIn(p).size == 1)
  }

  test("pack_sequences: per-shard window (no global ordering before the cumsum)") {
    val p = plan("pack_sequences")
    assert(p.contains("Exchange hashpartitioning(source"))
    // the only global sort is the final presentation orderBy
    assert("\\bWindow\\b".r.findAllIn(p).size == 1)
  }

  test("vocab_coverage: term counts partial-aggregate map-side; top-k via sort-limit") {
    val p = plan("vocab_coverage")
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("corpus_mixture: totals ride a broadcast, never a row-level join") {
    val p = plan("corpus_mixture")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("llm_curation_full composes with no cartesian product anywhere") {
    val p = plan("llm_curation_full")
    assert(!p.contains("CartesianProduct"))
  }

  test("normalize_jw scores only DISTINCT values against a broadcast master") {
    val p = plan("normalize_jw")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("jaro_winkler") || p.contains("jarowinkler"),
      "native expression present in plan")
  }

  test("layout_zorder: bounds ride a broadcast; the fact side never shuffles") {
    val p = plan("layout_zorder")
    // 1-row bounds -> broadcast nested loop over the fact scan; a
    // SortMergeJoin or row-level hash exchange would mean the whole table
    // shuffles just to pick up two min/max pairs
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 0, s"unexpected row-level exchange:\n$p")
  }

  test("events_stream_interval_join: equi-key join, never a cartesian expansion") {
    val p = plan("events_stream_interval_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "time bound must ride the user_id equi-join as a post-filter")
  }

  test("decontaminate_bloom: probe filter present below the gram aggregation") {
    val p = plan("decontaminate_bloom")
    assert(p.contains("bloom_might_contain"))
  }

  test("text_chunk_bpe_handed: chunking stays a pure projection (no row shuffle)") {
    val p = plan("text_chunk_bpe_handed")
    // the only exchange allowed is the final presentation sort — the
    // cost fold/bucket/densify chain must never shuffle corpus rows
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking gained a row-level exchange:\n$p")
  }

  test("text_ft_score: weight table broadcasts, corpus text never shuffles") {
    val p = plan("text_ft_score")
    assert(p.contains("BroadcastHashJoin"), "weight join must broadcast")
    assert(!p.contains("SortMergeJoin"))
    // the per-doc aggregation and the id join-back shuffle (id, partial)
    // pairs only; no exchange may carry the text column
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"), s"text shuffled:\n$exchanges")
  }

  test("pack_sequences_bpe_handed: one shard window exchange, encode on the scan") {
    val p = plan("pack_sequences_bpe_handed")
    // per-shard cumsum window + the final bin aggregate re-use ONE
    // hash exchange on the shard key (bpe_encode adds no shuffle)
    assert("Exchange hashpartitioning\\(source".r.findAllIn(p).size == 1,
      s"unexpected extra exchange:\n$p")
    assert(p.contains("bpe_encode"))
  }

  test("text_mojibake: the audit is a pure projection (no row-level shuffle)") {
    val p = plan("text_mojibake")
    assert(!p.contains("Exchange hashpartitioning"),
      s"encoding audit gained a row-level exchange:\n$p")
  }

  test("embedding_quantize: zero shuffle, zero join — codes on the scan") {
    val p = plan("embedding_quantize")
    assert(!p.contains("Exchange hashpartitioning"), s"quantize shuffled:\n$p")
    assert(!p.contains("Join"), s"quantize gained a join:\n$p")
  }

  test("quality_gate_auc: corpus collapses to the score frame map-side; text never shuffles") {
    val p = plan("quality_gate_auc")
    // distinct-score collapse must partial-aggregate before its exchange
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"score collapse lost map-side combine:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"), s"text shuffled:\n$exchanges")
  }

  test("quality_gate_pr: threshold sweep joins only the collapsed score frame") {
    val p = plan("quality_gate_pr")
    // the cross join is bounded-frame × 11 thresholds and must broadcast
    assert(p.contains("BroadcastNestedLoopJoin"), s"threshold join not broadcast:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"), s"text shuffled:\n$exchanges")
  }

  test("ann_sq8: the scan reads byte codes through the ADC kernel, queries broadcast") {
    val p = plan("ann_sq8")
    assert(p.contains("pq_adc_sum"), "ADC kernel not in the plan")
    assert(p.contains("BroadcastNestedLoopJoin"), "queries must broadcast")
    assert(!p.contains("CartesianProduct"), s"non-broadcast all-pairs:\n$p")
  }

  test("link_records: candidates come from an equi-join on the block key, never a cartesian") {
    val p = plan("link_records")
    assert(!p.contains("CartesianProduct"), s"linkage went all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"block join missing:\n$p")
    assert(p.contains("jaro_winkler"), "native JW expression not in the plan")
  }

  test("dedup_exact_sizes: fingerprint aggregation is partial'd; text never shuffles") {
    val p = plan("dedup_exact_sizes")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"size histogram lost map-side combine:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"), s"text shuffled:\n$exchanges")
  }

  test("corpus_source_stats: per-source partials combine map-side; text never shuffles") {
    val p = plan("corpus_source_stats")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"source stats lost map-side combine:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"), s"text shuffled:\n$exchanges")
  }

  test("ann_hamming: queries broadcast with their code words; kernel in the plan") {
    val p = plan("ann_hamming")
    assert(p.contains("bin_hamming"), "popcount kernel not in the plan")
    assert(p.contains("BroadcastNestedLoopJoin"), "queries must broadcast")
    assert(!p.contains("CartesianProduct"), s"non-broadcast all-pairs:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for a join:\n$p")
  }

  test("corpus_shard_plan: one partial'd aggregation; text never shuffles") {
    val p = plan("corpus_shard_plan")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"shard plan lost map-side combine:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text#"), s"text shuffled:\n$exchanges")
  }

  test("events_topk_agg: map-side-combined object aggregate, no window/per-key sort") {
    val p = plan("events_topk_agg")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"typed aggregate missing:\n$p")
    assert(!p.contains("Window"), s"window crept back in:\n$p")
    // partial + final pair proves the k-sized buffers combine map-side
    assert(p.contains("partial_topkagg") || p.contains("partial_TopKAgg") ||
      p.linesIterator.count(l => l.contains("Aggregate")) >= 2,
      s"no partial aggregation:\n$p")
  }

  test("drift_divergence: broadcast bounds, no row-level join") {
    val p = plan("drift_divergence")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"bounds not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"row-level join appeared:\n$p")
  }

  test("sample_bottomk: the selection is the sort-free typed aggregate") {
    val p = plan("sample_bottomk")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"typed aggregate missing:\n$p")
    // the only Window-free rank source is the aggregator; a window would
    // reintroduce the two partition-wide sorts the operator exists to avoid
    assert(!p.contains("Window"), s"window crept back in:\n$p")
  }

  test("sketch_cms: counters partial-aggregate map-side (d*w-bounded exchange)") {
    val p = plan("sketch_cms")
    assert(p.contains("partial_sum") || p.contains("partial sum") ||
      p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"sketch lost map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs appeared:\n$p")
  }

  test("cdc_apply: the window runs over the changelog; the base joins anti") {
    val p = plan("cdc_apply")
    assert(p.contains("LeftAnti"), s"pass-through lost its anti-join:\n$p")
    // exactly one Window — over the changelog's latest-change ranking
    // (tree prefixes like ':- ' / '+- ' precede the operator name)
    assert(p.linesIterator.count(_.contains("Window [")) == 1,
      s"unexpected window count:\n$p")
  }

  test("events_scd2: both windows share ONE entity-keyed exchange") {
    val p = plan("events_scd2")
    val hashEx = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$p")
  }

  test("dedup_containment: the df-cap is a semi-join, no cartesian anywhere") {
    val p = plan("dedup_containment")
    assert(p.contains("LeftSemi"), s"df-cap lost its semi-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs appeared:\n$p")
  }

  test("normalize_nfc: a pure projection — no shuffle except the final sort") {
    val p = plan("normalize_nfc")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    // rangepartitioning = the final presentation sort; RoundRobin = the
    // Tables.load scan-parallelism fix-up (r14) — the pin still catches
    // the failure class it exists for: a row-level HASH shuffle.
    assert(exchanges.forall(l =>
      l.contains("rangepartitioning") || l.contains("RoundRobinPartitioning")),
      s"non-sort exchange in a projection op:\n${exchanges.mkString("\n")}")
    assert(p.contains("unicode_normalize") || p.contains("UnicodeNormalize"),
      s"native expression missing from the plan:\n$p")
  }

  test("graph_pagerank: map-side-combined contributions, no cartesian") {
    // The registered query checkpoints each round (the plan shows only
    // the final scan), so pin the UN-truncated single-iteration plan the
    // operator itself builds.
    import org.apache.spark.sql.functions.col
    val e = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
    val p = graft.graph.PageRank.ranks(e, "src", "dst",
        iterations = 1, checkpoint = false)
      .queryExecution.explainString(SimpleMode)
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"contribution sum lost map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs appeared:\n$p")
  }

  test("dedup_winnow: gram text never enters an exchange") {
    val p = plan("dedup_winnow")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("gram") && !exchanges.contains("text"),
      s"corpus text shuffled:\n$exchanges")
    // ONE hash exchange: the fingerprint distinct reuses the per-doc
    // window partitioning (partial+final aggregate, no second shuffle)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"unexpected exchange count:\n$p")
  }

  test("bootstrap_ci_mean: the xB explosion feeds a partial aggregate") {
    val p = plan("bootstrap_ci_mean")
    assert(p.contains("Generate explode"), s"replicate explode missing:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"replicate means lost map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"), s"all-pairs appeared:\n$p")
  }

  test("sketch_hll: one scan, register max combines map-side, no explode") {
    val p = plan("sketch_hll")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"multiple scans:\n$p")
    assert(!p.contains("Generate"), s"needless explode:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"register max lost map-side combine:\n$p")
  }

  test("text_scripts: a pure projection — no shuffle except the final sort") {
    val p = plan("text_scripts")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    // rangepartitioning = the final sort; RoundRobin = the Tables.load
    // scan-parallelism fix-up (r14) — see normalize_nfc's pin.
    assert(exchanges.forall(l =>
      l.contains("rangepartitioning") || l.contains("RoundRobinPartitioning")),
      s"non-sort exchange in a projection op:\n${exchanges.mkString("\n")}")
    assert(!p.contains("HashAggregate"), s"unexpected aggregation:\n$p")
  }

  test("events_cusum: all four window passes share ONE series exchange") {
    val p = plan("events_cusum")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"window passes split their exchange:\n$p")
  }

  test("text_vocab_drift: counts partial-aggregate; text never shuffles") {
    val p = plan("text_vocab_drift")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"term counts lost map-side combine:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).mkString("\n")
    assert(!exchanges.contains("text"), s"corpus text shuffled:\n$exchanges")
  }

  test("gate_conformal: model and qhat broadcast; no sort-merge join") {
    val p = plan("gate_conformal")
    assert(p.contains("BroadcastHashJoin"), s"model not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"row-level shuffle join:\n$p")
  }

  test("sketch_hll64: one scan, no explode, register max combines map-side") {
    val p = plan("sketch_hll64")
    assert("Scan parquet".r.findAllIn(p).size == 1, s"multiple scans:\n$p")
    assert(!p.contains("Generate"), s"needless explode:\n$p")
    assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"register max lost map-side combine:\n$p")
  }

  test("drift_cvm_timeseries: base histogram broadcast onto periods, no cartesian") {
    val p = plan("drift_cvm_timeseries")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"base histogram not broadcast:\n$p")
  }

  test("ann_pq_handed: codebook and LUT broadcast; no cartesian") {
    val p = plan("ann_pq_handed")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"LUT/codebook not broadcast:\n$p")
  }

  test("ann_ivfpq_handed and the portable curation chain: no cartesian anywhere") {
    assert(!plan("ann_ivfpq_handed").contains("CartesianProduct"))
    assert(!plan("llm_curation_full_portable").contains("CartesianProduct"))
  }
}
