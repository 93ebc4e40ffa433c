package graft

import graft.text.Chunking
import org.apache.spark.sql.functions._

/** Pins [[graft.text.Chunking]]: lossless coverage (dropping each chunk's
  * leading overlap reconstructs the document token-for-token), the window
  * bounds, the overlap stitching property, and argument validation. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val maxT = 8
  private val over = 3

  private def fixture = Seq(
    1L -> "a b c d e f g h i j k l m n o p q r s t",  // 20 toks, multi-chunk
    2L -> "one two three",                             // fits in one window
    3L -> "  padded   with\tmixed   whitespace\n tokens here ", // messy ws
    4L -> " ",                                         // blank: zero chunks
    5L -> ("x " * 13).trim                             // 13 toks: exact tail
  ).toDF("doc_id", "text")

  test("dropping each chunk's leading overlap reconstructs the document") {
    val chunks = Chunking.chunk(fixture, "doc_id", "text", maxT, over)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = chunks.groupBy(_.getLong(0)).toSeq.sortBy(_._1)
    assert(byDoc.map(_._1) == Seq(1L, 2L, 3L, 5L)) // blank doc 4 absent
    for ((id, rows) <- byDoc) {
      val expected = fixture.filter(col("doc_id") === id)
        .select(split(trim(col("text")), "\\s+")).collect()(0)
        .getSeq[String](0)
      val rebuilt = rows.sortBy(_.getInt(1)).zipWithIndex.flatMap {
        case (r, i) =>
          val toks = r.getString(2).split(" ").toSeq
          if (i == 0) toks else toks.drop(over)
      }.toSeq
      assert(rebuilt == expected, s"doc $id reconstruction")
    }
  }

  test("every chunk respects the budget and n_tokens matches its text") {
    val chunks = Chunking.chunk(fixture, "doc_id", "text", maxT, over).collect()
    assert(chunks.nonEmpty)
    chunks.foreach { r =>
      val n = r.getInt(3)
      assert(n >= 1 && n <= maxT)
      assert(r.getString(2).split(" ").length == n)
    }
    // doc 1: 20 tokens, stride 5 -> 1 + ceil(12/5) = 4 chunks
    assert(chunks.count(_.getLong(0) == 1L) == 4)
    // doc 2 fits -> exactly one chunk of 3
    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getInt(3) == 3)
  }

  test("consecutive full chunks share exactly the overlap") {
    val chunks = Chunking.chunk(fixture, "doc_id", "text", maxT, over)
      .filter(col("doc_id") === 1L).orderBy("chunk_id").collect()
    for (i <- 0 until chunks.length - 1 if chunks(i).getInt(3) == maxT) {
      val cur = chunks(i).getString(2).split(" ")
      val nxt = chunks(i + 1).getString(2).split(" ")
      assert(cur.takeRight(over).toSeq == nxt.take(over).toSeq,
        s"chunks $i/${i + 1} overlap")
    }
  }

  test("degenerate arguments raise") {
    intercept[IllegalArgumentException] {
      Chunking.chunk(fixture, "doc_id", "text", maxTokens = 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunk(fixture, "doc_id", "text", maxTokens = 8, overlap = 8)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByCost(fixture, "doc_id", "text", w => lit(1), budget = 0)
    }
  }

  test("unit-cost chunkByCost degenerates to chunk with zero overlap") {
    val byCost = Chunking.chunkByCost(fixture, "doc_id", "text",
        w => lit(1), budget = maxT)
      .select("doc_id", "chunk_id", "chunk_text", "n_words")
      .orderBy("doc_id", "chunk_id").collect().toSeq
    val plain = Chunking.chunk(fixture, "doc_id", "text", maxT, overlap = 0)
      .select("doc_id", "chunk_id", "chunk_text", "n_tokens")
      .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(byCost == plain)
  }

  test("BPE cost chunking respects the handed closed form and word atomicity") {
    // Handed model (t,h)+(e,r): "the"→3, "weather"→6 (see PackingSpec).
    // budget 7: "the weather" cums are 3, 9 → buckets floor(0/7)=0,
    // floor(3/7)=0 — one chunk despite total 9 > 7 (the straddling word
    // stays whole in its starting chunk).
    val handed = graft.text.Bpe.Model(Vector(("t", "h"), ("e", "r")))
    val df = Seq((1L, "the weather")).toDF("doc_id", "text")
    val out = Chunking.chunkBpe(df, "doc_id", "text", handed, budget = 7)
      .orderBy("chunk_id").collect()
    assert(out.length == 1)
    assert(out(0).getString(2) == "the weather")
    assert(out(0).getInt(3) == 2 && out(0).getLong(4) == 9L)
    // budget 3: cums 3, 9 → buckets floor(0/3)=0, floor(6/3)=2 →
    // densified chunk ids 0 and 1.
    val out3 = Chunking.chunkBpe(df, "doc_id", "text", handed, budget = 3)
      .orderBy("chunk_id").collect()
    assert(out3.map(_.getString(2)).toSeq == Seq("the", "weather"))
    assert(out3.map(_.getLong(4)).toSeq == Seq(3L, 6L))
  }

  test("persisted-model chunking is byte-equal to the direct model") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val trained = graft.text.Bpe.train(docs, "text", numMerges = 20)
    val path = java.nio.file.Files
      .createTempDirectory("graft-chunkbpe").toString
    graft.text.Bpe.writeModel(spark, trained, path)
    val reopened = graft.text.Bpe.readModel(spark, path)
    val direct = Chunking.chunkBpe(docs, "doc_id", "text", trained, 128)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    val roundTrip = Chunking.chunkBpe(docs, "doc_id", "text", reopened, 128)
      .orderBy("doc_id", "chunk_id").collect().toSeq
    assert(direct == roundTrip)
    assert(direct.nonEmpty)
  }
}
