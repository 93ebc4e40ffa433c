package graft.queries

import graft.Tables
import graft.ops.{Packing, Quota}
import graft.text.{Mixture, TextAnalysis, Vocab}
import org.apache.spark.sql.functions._

/** Driver-checked queries for the corpus-composition operators: per-source
  * quota caps, mixture planning, sequence packing, vocabulary coverage. */
object MixtureQueries {

  /** DuckDB token count matching [[TextAnalysis.tokenCount]]. */
  private val sqlTok = s"CAST(${TextQueries.sqlTokenCount()} AS BIGINT)"

  val all: Seq[Q] = Seq(
    // Anti-domination quota: at most 10 docs per source, hash-selected.
    Q("sample_quota",
      (s, dir) => Quota.capPerGroup(Tables.documents(s, dir),
          "source", "doc_id", n = 10)
        .select("doc_id", "source").orderBy("doc_id"),
      Some(s"""
        SELECT doc_id, source FROM documents
        QUALIFY ${Quota.sqlQualify("source", "doc_id", 10)}
        ORDER BY doc_id""")),

    // Deterministic 16-shard export plan: per-shard doc/token/char mass +
    // token share. HASH-GREEN: the multiplicative scatter
    // ((id·M) mod P) mod n is exact in plain 64-bit arithmetic, so the
    // oracle recomputes the ASSIGNMENT itself verbatim — not just the
    // aggregates.
    Q("corpus_shard_plan",
      (s, dir) => graft.ops.Sharding.shardPlan(
          Tables.documents(s, dir), "doc_id", "text", n = 16),
      Some(shardPlanOracle)),

    // The SAME plan recomputed from a PERSISTED sharded export (write
    // partitioned by shard → manifest LAST → re-open through the refusal
    // ladder) against the SAME oracle — the export lifecycle is proven
    // value-identical to the direct plan (the ann_sq8_persisted
    // precedent).
    Q("corpus_shard_persisted",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val path = NearDupQueries.scratchIndexDir(s, "shards", dir)
        graft.ops.Sharding.writeShards(d, "doc_id", "text", path, n = 16)
        graft.ops.Sharding.planFromSharded(
          graft.ops.Sharding.readShards(s, path), "text")
      },
      Some(shardPlanOracle)),

    // Shard mixture balance: per (shard, source) composition with each
    // shard's deviation from the corpus-wide source share — the scatter
    // must hand every shard an unbiased sample or per-shard training
    // batches drift. HASH-GREEN: the deviation is a single subtraction
    // of two exact-count ratios.
    Q("corpus_shard_balance",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .withColumn("shard", graft.ops.Sharding.shardId(col("doc_id"), 16))
        val wShard = org.apache.spark.sql.expressions.Window.partitionBy("shard")
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        val wSrc = org.apache.spark.sql.expressions.Window.partitionBy("source")
        d.groupBy("shard", "source").agg(count(lit(1)).as("n_docs"))
          .withColumn("shard_share",
            col("n_docs").cast("double") / sum("n_docs").over(wShard).cast("double"))
          .withColumn("corpus_share",
            sum("n_docs").over(wSrc).cast("double") / sum("n_docs").over(wAll).cast("double"))
          .select(col("shard"), col("source"), col("n_docs"),
            graft.Num.dround(col("shard_share"), 6).as("shard_share"),
            graft.Num.dround(col("corpus_share"), 6).as("corpus_share"),
            graft.Num.dround(col("shard_share") - col("corpus_share"), 6)
              .as("deviation"))
          .orderBy("shard", "source")
      },
      Some("""
        WITH t AS (
          SELECT CAST(((doc_id * 2654435761) % 1000000007) % 16 AS INT) AS shard,
                 source
          FROM documents),
        g AS (SELECT shard, source, CAST(count(*) AS BIGINT) AS n_docs
              FROM t GROUP BY shard, source),
        w AS (SELECT shard, source, n_docs,
                     CAST(n_docs AS DOUBLE) /
                       CAST(sum(n_docs) OVER (PARTITION BY shard) AS DOUBLE) AS ss,
                     CAST(sum(n_docs) OVER (PARTITION BY source) AS DOUBLE) /
                       CAST(sum(n_docs) OVER () AS DOUBLE) AS cs
              FROM g)
        SELECT shard, source, n_docs,
               floor(ss * 1e6 + 0.5) / 1e6 AS shard_share,
               floor(cs * 1e6 + 0.5) / 1e6 AS corpus_share,
               floor((ss - cs) * 1e6 + 0.5) / 1e6 AS deviation
        FROM w ORDER BY shard, source""")),

    // JSONL export round trip: write the corpus as JSON-LINES shards
    // (the format every training stack reads — the interop lane of the
    // export), re-open under the manifest-pinned schema, and emit the
    // ROWS themselves. HASH-GREEN against the source table + recomputed
    // scatter: document content (text itself, not a digest), ids, and
    // shard assignment all survive the text round trip exactly.
    Q("corpus_shard_jsonl",
      (s, dir) => {
        val d = Tables.documents(s, dir).select("doc_id", "lang", "text")
        val path = NearDupQueries.scratchIndexDir(s, "shards-jsonl", dir)
        graft.ops.Sharding.writeShardsJsonl(d, "doc_id", "text", path, n = 8)
        graft.ops.Sharding.readShardsJsonl(s, path)
          .select(col("doc_id"), col("lang"), col("shard"), col("text"))
          .orderBy("doc_id")
      },
      Some("""
        SELECT doc_id, lang,
               CAST(((doc_id * 2654435761) % 1000000007) % 8 AS INT) AS shard,
               text
        FROM documents ORDER BY doc_id""")),

    // Incremental ingest under the gate: export the even half, APPEND the
    // odd half (stateless scatter → no reshuffle of existing data,
    // id-collision refusal before any write), re-open, re-derive the plan
    // — against the SAME oracle, so write ∪ append ≡ one full write.
    Q("corpus_shard_append",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val path = NearDupQueries.scratchIndexDir(s, "shards-app", dir)
        graft.ops.Sharding.writeShards(
          d.filter(col("doc_id") % 2 === 0), "doc_id", "text", path, n = 16)
        graft.ops.Sharding.appendToShards(
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text", path)
        graft.ops.Sharding.planFromSharded(
          graft.ops.Sharding.readShards(s, path), "text")
      },
      Some(shardPlanOracle)),

    // Mixture plan: per-source composition + uniform-weight sampling rates
    // toward half the corpus tokens.
    Q("corpus_mixture",
      (s, dir) => Mixture.plan(Tables.documents(s, dir), "source", "text",
          budgetFrac = 0.5)
        .orderBy("source"),
      Some(s"""
        WITH per_source AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 sum($sqlTok) AS n_tokens
          FROM documents GROUP BY source),
        tot AS (SELECT sum(n_tokens) AS total, CAST(count(*) AS BIGINT) AS nsrc
                FROM per_source)
        SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
               floor((CASE WHEN total = 0 THEN 0.0
                 ELSE CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) END) * 1e6 + 0.5) / 1e6 AS token_share,
               floor((CASE WHEN n_tokens = 0 THEN 0.0
                 ELSE least(1.0, (0.5 * CAST(total AS DOUBLE) / CAST(nsrc AS DOUBLE))
                   / CAST(n_tokens AS DOUBLE)) END) * 1e6 + 0.5) / 1e6 AS sample_rate
        FROM per_source, tot ORDER BY source""")),

    // α-temperature mixture (XLM-R's multilingual up-sampling recipe):
    // tempered weights q_i ∝ share_i^0.3 flatten the source distribution
    // so low-resource sources up-sample; rates split half the corpus
    // tokens by the tempered weights. pow on an already-dround'd share,
    // weights through the dround + exact-decimal-sum discipline.
    Q("corpus_mixture_temperature",
      (s, dir) => Mixture.temperaturePlan(Tables.documents(s, dir),
          "source", "text", alpha = 0.3, budgetFrac = 0.5)
        .orderBy("source"),
      Some(s"""
        WITH per_source AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 sum($sqlTok) AS n_tokens
          FROM documents GROUP BY source),
        tot0 AS (SELECT sum(n_tokens) AS total FROM per_source),
        shr AS (
          SELECT source, n_docs, n_tokens,
                 floor((CASE WHEN total = 0 THEN 0.0
                   ELSE CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) END)
                   * 1e6 + 0.5) / 1e6 AS token_share
          FROM per_source, tot0),
        sa AS (
          SELECT *, floor(pow(token_share, 0.3) * 1e8 + 0.5) / 1e8 AS s_a
          FROM shr),
        zt AS (SELECT CAST(sum(CAST(s_a AS DECIMAL(38,8))) AS DOUBLE) AS z,
                      sum(n_tokens) AS total
               FROM sa),
        wt AS (
          SELECT source, n_docs, n_tokens, token_share,
                 floor((CASE WHEN z = 0 THEN 0.0 ELSE s_a / z END)
                   * 1e6 + 0.5) / 1e6 AS weight,
                 total
          FROM sa, zt)
        SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
               token_share, weight,
               floor((CASE WHEN n_tokens = 0 THEN 0.0
                 ELSE least(1.0, 0.5 * CAST(total AS DOUBLE) * weight
                   / CAST(n_tokens AS DOUBLE)) END) * 1e6 + 0.5) / 1e6 AS sample_rate
        FROM wt ORDER BY source""")),

    // Sequence packing into 512-token bins, sharded by source.
    Q("pack_sequences",
      (s, dir) => Packing.packStats(
          Tables.documents(s, dir)
            .select(col("doc_id"), col("source"),
              TextAnalysis.tokenCount(col("text")).as("n_tok")),
          "source", "doc_id", "n_tok", budget = 512)
        .orderBy("source", "bin"),
      Some(s"""
        WITH d AS (
          SELECT doc_id, source, $sqlTok AS n_tok
          FROM documents),
        c AS (
          SELECT doc_id, source, n_tok,
                 sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id, n_tok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d),
        b AS (SELECT source, CAST(floor((cum - n_tok) / 512.0) AS BIGINT) AS bin,
                     n_tok
              FROM c)
        SELECT source, bin, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               floor((CAST(sum(n_tok) AS DOUBLE) / 512.0) * 1e4 + 0.5) / 1e4 AS fill_frac
        FROM b GROUP BY source, bin ORDER BY source, bin""")),

    // Tokenizer-consistent packing under an ENGINE-TRAINED BPE model:
    // bins are denominated in the subword units the trainer consumes
    // (whitespace counts under-count prose ~1.3×, so whitespace-budget
    // bins overflow the context window). Rows-only (engine-trained merge
    // table — the bpe_train_encode precedent); pack_sequences_bpe_handed
    // hash-checks the same algebra and PackingSpec byte-pins the
    // persisted-model round trip.
    Q("pack_sequences_bpe",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val model = graft.text.Bpe.train(
          docs.select("doc_id", "text"), "text", numMerges = 40)
        Packing.packStatsBpe(docs.select("doc_id", "source", "text"),
            "source", "doc_id", "text", model, budget = 2048)
          .orderBy("source", "bin")
      },
      None),

    // The same BPE packing HASH-CHECKED under the handed two-rule merge
    // table (TextQueries.handedBpe): per-word subword cost has a closed
    // replace()-arithmetic form, summed per doc, then the exact
    // pack_sequences window/bin/aggregate chain.
    Q("pack_sequences_bpe_handed",
      (s, dir) => Packing.packStatsBpe(
          Tables.documents(s, dir).select("doc_id", "source", "text"),
          "source", "doc_id", "text", TextQueries.handedBpe, budget = 2048)
        .orderBy("source", "bin"),
      Some(s"""
        WITH wrd AS (
          SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents),
        pc AS (
          SELECT doc_id,
                 sum(${TextQueries.sqlHandedBpeCost("w")}) AS n_tok
          FROM wrd GROUP BY 1),
        d AS (
          SELECT doc.doc_id, doc.source,
                 CAST(coalesce(pc.n_tok, 0) AS BIGINT) AS n_tok
          FROM documents doc LEFT JOIN pc ON pc.doc_id = doc.doc_id),
        c AS (
          SELECT doc_id, source, n_tok,
                 sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id, n_tok
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM d),
        b AS (SELECT source, CAST(floor((cum - n_tok) / 2048.0) AS BIGINT) AS bin,
                     n_tok
              FROM c)
        SELECT source, bin, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               floor((CAST(sum(n_tok) AS DOUBLE) / 2048.0) * 1e4 + 0.5) / 1e4 AS fill_frac
        FROM b GROUP BY source, bin ORDER BY source, bin""")),

    // Mixture planning with the token budget denominated in BPE subwords
    // (the tokenCount lane) — HASH-CHECKED under the handed merge table.
    // The plan's shares/rates shift against corpus_mixture exactly where
    // a source's subword-per-word rate differs from the corpus mean —
    // the misallocation the whitespace lane can't see.
    Q("corpus_mixture_bpe",
      (s, dir) => Mixture.plan(Tables.documents(s, dir), "source", "text",
          budgetFrac = 0.5,
          tokenCount = t => size(graft.functions.BpeEncodeFun.bpeEncode(
            t, TextQueries.handedBpe.merges)))
        .orderBy("source"),
      Some(s"""
        WITH wrd AS (
          SELECT doc_id, unnest(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents),
        pc AS (
          SELECT doc_id,
                 sum(${TextQueries.sqlHandedBpeCost("w")}) AS n_tok
          FROM wrd GROUP BY 1),
        d AS (
          SELECT doc.source, CAST(coalesce(pc.n_tok, 0) AS BIGINT) AS n_tok
          FROM documents doc LEFT JOIN pc ON pc.doc_id = doc.doc_id),
        per_source AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 sum(n_tok) AS n_tokens
          FROM d GROUP BY source),
        tot AS (SELECT sum(n_tokens) AS total, CAST(count(*) AS BIGINT) AS nsrc
                FROM per_source)
        SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
               floor((CASE WHEN total = 0 THEN 0.0
                 ELSE CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) END) * 1e6 + 0.5) / 1e6 AS token_share,
               floor((CASE WHEN n_tokens = 0 THEN 0.0
                 ELSE least(1.0, (0.5 * CAST(total AS DOUBLE) / CAST(nsrc AS DOUBLE))
                   / CAST(n_tokens AS DOUBLE)) END) * 1e6 + 0.5) / 1e6 AS sample_rate
        FROM per_source, tot ORDER BY source""")),

    // Vocabulary coverage: top-50 terms + cumulative corpus-token share.
    Q("vocab_coverage",
      (s, dir) => Vocab.coverage(Tables.documents(s, dir), "text", k = 50)
        .orderBy("rank"),
      Some("""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
          FROM documents),
        counts AS (
          SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks
          WHERE length(term) > 0 GROUP BY term),
        tot AS (SELECT sum(cnt) AS total FROM counts),
        top AS (SELECT term, cnt FROM counts ORDER BY cnt DESC, term LIMIT 50)
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INT) AS rank,
               term, cnt,
               floor((CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 / CAST(total AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS cum_share
        FROM top, tot ORDER BY rank""")),

    // Zipf rank-frequency audit: ln-ln regression slope over the top-20
    // terms — natural text sits near −1; flat flags templated/synthetic
    // corpora. HASH-GREEN: ln on identical operands, 10dp-rounded terms
    // into exact decimal sums, the same closed-form slope tree.
    // PMI collocations (Church & Hanks 1990): top-50 adjacent bigrams by
    // pointwise mutual information with a min-count-5 floor (PMI's
    // rare-pair noise fix) — phrase mining / boilerplate discovery /
    // tokenizer merge-candidate audit. HASH-GREEN: exact long counts,
    // one IEEE ratio 6dp-rounded BEFORE the ln (the ln-on-rounded-args
    // precedent), ties on bigram text.
    Q("text_pmi",
      (s, dir) => Vocab.collocations(Tables.documents(s, dir), "text",
        minCount = 5, k = 50),
      Some(s"""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
          FROM documents),
        uni AS (
          SELECT term, CAST(count(*) AS BIGINT) AS cu FROM toks
          WHERE length(term) > 0 GROUP BY term),
        bi AS (
          SELECT bigram, CAST(count(*) AS BIGINT) AS cnt FROM (
            SELECT unnest(${Q.sqlNgrams("l", 2)}) AS bigram
            FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS l
                  FROM documents))
          WHERE length(bigram) > 0 GROUP BY bigram
          HAVING count(*) >= 5),
        tot AS (SELECT (SELECT sum(cu) FROM uni) AS n1,
                       (SELECT sum(cnt) FROM bi) AS n2),
        parts AS (
          SELECT b.bigram, b.cnt, ux.cu AS cnt_x, uy.cu AS cnt_y, n1, n2
          FROM bi b
          JOIN uni ux ON ux.term = string_split(b.bigram, ' ')[1]
          JOIN uni uy ON uy.term = string_split(b.bigram, ' ')[2]
          CROSS JOIN tot)
        SELECT bigram, cnt, cnt_x, cnt_y,
               floor(ln(floor(
                 ((CAST(cnt AS DOUBLE) / CAST(n2 AS DOUBLE)) /
                  ((CAST(cnt_x AS DOUBLE) / CAST(n1 AS DOUBLE)) *
                   (CAST(cnt_y AS DOUBLE) / CAST(n1 AS DOUBLE))))
                 * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6 AS pmi
        FROM parts
        ORDER BY pmi DESC, bigram LIMIT 50""")),

    Q("text_zipf",
      (s, dir) => Vocab.zipf(Tables.documents(s, dir), "text", k = 20)
        .orderBy("rank"),
      Some("""
        WITH toks AS (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
          FROM documents),
        counts AS (
          SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks
          WHERE length(term) > 0 GROUP BY term),
        top AS (SELECT term, cnt FROM counts ORDER BY cnt DESC, term LIMIT 20),
        rk AS (SELECT CAST(row_number() OVER (ORDER BY cnt DESC, term) AS INT) AS rank,
                      term, cnt FROM top),
        t AS (SELECT rank, term, cnt,
                     floor(ln(CAST(rank AS DOUBLE)) * 1e10 + 0.5) / 1e10 AS ln_rank,
                     floor(ln(CAST(cnt AS DOUBLE)) * 1e10 + 0.5) / 1e10 AS ln_cnt
              FROM rk),
        t2 AS (SELECT *,
                      floor(ln_rank * ln_cnt * 1e10 + 0.5) / 1e10 AS xy,
                      floor(ln_rank * ln_rank * 1e10 + 0.5) / 1e10 AS xx
               FROM t),
        s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                     CAST(sum(CAST(ln_rank AS DECIMAL(38,10))) AS DOUBLE) AS sx,
                     CAST(sum(CAST(ln_cnt AS DECIMAL(38,10))) AS DOUBLE) AS sy,
                     CAST(sum(CAST(xy AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
                     CAST(sum(CAST(xx AS DECIMAL(38,10))) AS DOUBLE) AS sxx
              FROM t2)
        SELECT rank, term, cnt, ln_rank, ln_cnt,
               CASE WHEN n * sxx - sx * sx <> 0 THEN
                 floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5) / 1e6
               END AS zipf_slope
        FROM t2, s ORDER BY rank"""))
  )

  /** Shared by corpus_shard_plan and corpus_shard_persisted: the oracle
    * recomputes the multiplicative scatter verbatim (exact 64-bit
    * integer arithmetic — see [[graft.ops.Sharding.shardId]]). */
  private[queries] def shardPlanOracle: String = s"""
        WITH t AS (
          SELECT CAST(((doc_id * 2654435761) % 1000000007) % 16 AS INT) AS shard,
                 $sqlTok AS tk,
                 CAST(length(text) AS BIGINT) AS ch
          FROM documents),
        agg AS (
          SELECT shard, count(*) AS n_docs,
                 CAST(sum(tk) AS BIGINT) AS n_tokens,
                 CAST(sum(ch) AS BIGINT) AS n_chars
          FROM t GROUP BY shard)
        SELECT shard, n_docs, n_tokens, n_chars,
               floor((CAST(n_tokens AS DOUBLE) /
                 CAST((SELECT sum(n_tokens) FROM agg) AS DOUBLE)) * 1e6 + 0.5) / 1e6
                 AS token_share
        FROM agg ORDER BY shard"""
}
