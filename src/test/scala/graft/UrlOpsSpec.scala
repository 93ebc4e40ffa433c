package graft

import graft.normalize.UrlOps
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq

  test("canonicalize lowercases scheme/host, strips default port + fragment") {
    assert(canon("HTTPS://WWW.Ex.COM:443/Path/A?id=1#frag") ===
      Seq("https://www.ex.com/Path/A?id=1"))
    assert(canon("HTTP://a.B.com:80/x") === Seq("http://a.b.com/x"))
    // non-default port survives; path case preserved
    assert(canon("http://a.com:8080/UP") === Seq("http://a.com:8080/UP"))
    // :443 is only default for https, :80 only for http
    assert(canon("http://a.com:443/x") === Seq("http://a.com:443/x"))
  }

  test("canonicalize removes tracking params, preserves order, '/' for empty path") {
    assert(canon("https://a.com/p?utm_source=x&id=5&utm_campaign=y&fbclid=1") ===
      Seq("https://a.com/p?id=5"))
    // all params tracking -> query dropped entirely
    assert(canon("https://a.com/p?utm_source=x&gclid=2") === Seq("https://a.com/p"))
    // order of survivors preserved (never sorted)
    assert(canon("https://a.com/p?b=2&a=1") === Seq("https://a.com/p?b=2&a=1"))
    assert(canon("https://A.com") === Seq("https://a.com/"))
    assert(canon("https://a.com?ref=r") === Seq("https://a.com/"))
  }

  test("canonicalize passes through non-URLs trimmed and punycode hosts intact") {
    assert(canon("  plain text  ") === Seq("plain text"))
    assert(canon("https://XN--BCHER-KVA.example/B%C3%BCcher") ===
      Seq("https://xn--bcher-kva.example/B%C3%BCcher"))
  }

  test("dedupByUrl keys on the canonical form and keeps the smallest id") {
    val docs = Seq(
      (3L, "https://a.com/p?id=1&utm_source=x"),
      (1L, "HTTPS://A.COM:443/p?id=1#top"),
      (2L, "https://a.com/p?id=2"),
      (9L, "not a url")).toDF("doc_id", "url")
    val out = UrlOps.dedupByUrl(docs, "doc_id", "url")
      .orderBy("url_canon").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq === Seq(
      ("https://a.com/p?id=1", 1L, 2L),
      ("https://a.com/p?id=2", 2L, 1L),
      ("not a url", 9L, 1L)))
  }
}
