package graft.normalize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-keyed dedup — the FIRST dedup stage of a
  * web-corpus curation pipeline (RefinedWeb, Penedo et al. 2023, public
  * paper: URL-level dedup runs before any content pass because it is
  * free — a pure projection — and removes the bulk of recrawl clones).
  * Reference parity: the reference normalizes entity STRINGS
  * (m03_normalize fuzzy/text maps); URLs are the scale-side analogue
  * where the normal form is structural, not fuzzy.
  *
  * Canonical form (the documented contract):
  *   - scheme and host:port lowercase (path/query case PRESERVED —
  *     paths are case-sensitive on most origins);
  *   - default port stripped (`:80` for http, `:443` for https);
  *   - fragment dropped (never sent to the server);
  *   - tracking params removed by KEY (utm_*, gclid, fbclid, msclkid,
  *     mc_eid, ref), remaining params in ORIGINAL order — sorting would
  *     merge `?a=1&b=2` with `?b=2&a=1`, which are distinct cache keys
  *     to most origins;
  *   - empty path normalizes to `/`;
  *   - punycode (`xn--`) hosts pass through untouched (already ASCII);
  *   - a string with no `scheme://host` shape passes through trimmed —
  *     for dedup keying a non-URL is its own key, not an error.
  *
  * Everything is a per-row regex/split projection — codegen'd, no
  * shuffle at any scale; the pattern constants are the RE2-safe subset
  * (the CorpusOps PII discipline) and every step has an exact DuckDB
  * mirror built from the SAME constants.
  */
object UrlOps {

  val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val HostRe   = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
  /** Path + query (everything after host, before any fragment). */
  val RestRe   = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"
  /** Tracking-param keys, matched at the start of one `k=v` piece. */
  val TrackRe  = "^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|mc_eid|ref)="

  def canonicalize(c: Column): Column = {
    val scheme   = lower(regexp_extract(c, SchemeRe, 1))
    val hostport = lower(regexp_extract(c, HostRe, 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rest  = regexp_extract(c, RestRe, 1)
    val qpos  = instr(rest, "?")
    val path  = when(qpos > 0, substring_index(rest, "?", 1)).otherwise(rest)
    val query = when(qpos > 0, rest.substr(qpos + 1, length(rest)))
      .otherwise(lit(""))
    val kept = filter(split(query, "&"),
      p => !p.rlike(TrackRe) && p =!= lit(""))
    val q2 = array_join(kept, "&")
    when(scheme === "" || hostport === "", trim(c))
      .otherwise(concat(scheme, lit("://"), host,
        when(path === "", lit("/")).otherwise(path),
        when(q2 === "", lit("")).otherwise(concat(lit("?"), q2))))
  }

  /** DuckDB mirror of [[canonicalize]] — same constants, same steps. */
  def sqlCanonicalize(e: String): String = {
    val scheme   = s"lower(regexp_extract($e, '$SchemeRe', 1))"
    val hostport = s"lower(regexp_extract($e, '$HostRe', 1))"
    val host =
      s"""CASE WHEN $scheme = 'http' THEN regexp_replace($hostport, ':80$$', '')
               WHEN $scheme = 'https' THEN regexp_replace($hostport, ':443$$', '')
               ELSE $hostport END"""
    val rest  = s"regexp_extract($e, '$RestRe', 1)"
    val path  = s"CASE WHEN strpos($rest, '?') > 0 THEN split_part($rest, '?', 1) ELSE $rest END"
    val query = s"""CASE WHEN strpos($rest, '?') > 0
                    THEN substring($rest, strpos($rest, '?') + 1, length($rest))
                    ELSE '' END"""
    val q2 = s"""array_to_string(list_filter(string_split($query, '&'),
        p -> NOT regexp_matches(p, '$TrackRe') AND p <> ''), '&')"""
    s"""CASE WHEN $scheme = '' OR $hostport = '' THEN trim($e)
        ELSE $scheme || '://' || $host
             || CASE WHEN $path = '' THEN '/' ELSE $path END
             || CASE WHEN $q2 = '' THEN '' ELSE '?' || $q2 END END"""
  }

  /** URL-keyed dedup: group on the canonical form, keep the smallest id
    * (deterministic across runs and partitionings — the exact-dedup
    * keep-first rule). One map-side-combined aggregation on the
    * canonical-key hash partitioning; only (key, id) pairs shuffle, the
    * document payload never moves. */
  def dedupByUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(canonicalize(col(urlCol)).as("url_canon"), col(idCol))
      .groupBy("url_canon")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))
}
