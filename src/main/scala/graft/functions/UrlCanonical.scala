package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl-scale dedup — the standard first pass of
  * a Common-Crawl-style pipeline (exact text dedup catches mirrored BODIES;
  * canonical-url dedup catches the same PAGE fetched under cosmetic URL
  * variants). Composed entirely from codegen'd built-ins (regexp/split/
  * array_sort/concat), so it runs inside whole-stage codegen with no UDF.
  *
  * Rules (deliberately conservative — nothing that changes which resource
  * the URL names):
  *  - scheme and host lowercased
  *  - default port stripped when it matches the scheme (:80 http, :443 https)
  *  - fragment dropped
  *  - tracking params dropped (utm_*, fbclid, gclid), remaining params
  *    sorted byte-wise
  *  - trailing slash stripped from non-root paths; empty path -> "/"
  *  - www. is KEPT (dropping it can change the named host)
  */
object UrlCanonical {
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host =
      when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
        .otherwise(hostPort)
    val rawPath = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "(.)/$", "$1"))
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("fbclid") ||
        p.startsWith("gclid") || p === lit("")))
    val sortedQ = array_join(array_sort(kept), "&")
    val canonical = concat(scheme, lit("://"), host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
    // unparseable inputs (relative hrefs, protocol-relative //host/p, plain
    // garbage) pass through UNCHANGED: collapsing them all to ':///' would
    // merge unrelated pages in canonical-url dedup — the opposite of
    // "nothing that changes which resource the URL names"
    when(scheme === "" || host === "", u).otherwise(canonical)
  }
}
