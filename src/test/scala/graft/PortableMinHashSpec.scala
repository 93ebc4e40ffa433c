package graft

import graft.dedup.PortableMinHash
import org.apache.spark.sql.functions._

class PortableMinHashSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("signature lanes replay the md5-prefix universal-hash fold exactly") {
    // brute-force the contract in plain JVM code: per shingle
    // h32 = first 8 md5 hex chars; lane i = min (a_i*(h%P)+b_i) % P
    val text = "alpha beta gamma delta epsilon zeta eta"
    val df = corpus(7L -> text)
    val got = PortableMinHash.signatureTable(df, "text", "doc_id", n = 3, k = 4)
      .orderBy("lane").select("sig").as[Long].collect()

    val toks = text.toLowerCase.trim.split("\\s+")
    val shingles = toks.sliding(3).map(_.mkString(" ")).toSeq
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val P = PortableMinHash.P
    val want = (0 until 4).map { i =>
      shingles.map { s =>
        (PortableMinHash.laneA(i) * (h32(s) % P) + PortableMinHash.laneB(i)) % P
      }.min
    }
    assert(got.toSeq == want)
  }

  test("short documents fall back to one whole-doc shingle") {
    // two identical 2-token docs, n=5: both signatures come from the
    // single whole-doc shingle and must be identical lane by lane
    val df = corpus(1L -> "tiny doc", 2L -> "tiny doc", 3L -> "other words")
    val sigs = PortableMinHash.signatureTable(df, "text", "doc_id", n = 5, k = 8)
    val byDoc = sigs.groupBy("doc_id")
      .agg(sort_array(collect_list(struct($"lane", $"sig"))).as("s"))
      .orderBy("doc_id").select("s").collect()
    assert(byDoc(0) == byDoc(1))
    assert(byDoc(0) != byDoc(2))
  }

  test("identical docs pair at est 1.0 and greedy keep drops the larger id") {
    val df = corpus(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "the quick brown fox jumps over the lazy dog again and again",
      5L -> "completely different content about distributed query engines here")
    val p = PortableMinHash.pairs(df, "text", "doc_id",
      n = 3, k = 8, bands = 4, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSeq
    assert(p == Seq((1L, 2L, 1.0)))
    val kept = PortableMinHash.kept(df, "text", "doc_id",
      n = 3, k = 8, bands = 4, threshold = 0.5)
      .as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 5L))
  }

  test("disjoint docs produce no pairs and keep everything") {
    val df = corpus(
      1L -> "one two three four five six seven",
      2L -> "eight nine ten eleven twelve thirteen fourteen")
    assert(PortableMinHash.pairs(df, "text", "doc_id",
      n = 3, k = 8, bands = 4, threshold = 0.5).isEmpty)
    assert(PortableMinHash.kept(df, "text", "doc_id",
      n = 3, k = 8, bands = 4, threshold = 0.5).count() == 2)
  }

  test("refuses k not divisible by bands and k < 1") {
    val df = corpus(1L -> "a b c d e f")
    intercept[IllegalArgumentException] {
      PortableMinHash.pairs(df, "text", "doc_id", n = 3, k = 10, bands = 4)
    }
    intercept[IllegalArgumentException] {
      PortableMinHash.signatures(df, "text", "doc_id", n = 3, k = 0)
    }
  }

  test("lane constants stay inside (0, P) so products cannot overflow") {
    (0 until 256).foreach { i =>
      val a = PortableMinHash.laneA(i); val b = PortableMinHash.laneB(i)
      assert(a > 0 && a < PortableMinHash.P, s"laneA($i)=$a")
      assert(b >= 0 && b < PortableMinHash.P, s"laneB($i)=$b")
    }
  }
}
