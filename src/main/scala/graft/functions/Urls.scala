package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the standard first pass
  * of a crawl pipeline: the same page is fetched under dozens of
  * surface forms (case-varied hosts, default ports, duplicate slashes,
  * tracking parameters, unordered query strings, fragments), and exact
  * content dedup only catches them after a full download. Canonical
  * form:
  *
  *   - scheme and host lowercased
  *   - default port dropped (`:80` for http, `:443` for https)
  *   - duplicate path slashes collapsed, trailing slash dropped
  *     (root path stays `/`; an empty path becomes `/`)
  *   - tracking parameters removed (`utm_*`, `fbclid`, `gclid`,
  *     `msclkid`, `ref`)
  *   - surviving query parameters sorted (full `k=v` byte order)
  *   - fragment dropped
  *
  * Everything is built-in column algebra (regexp + split + filter +
  * array_sort) — whole-stage codegen'd, no UDF boundary, safe to run
  * at crawl scale as a map-side projection on the scan.
  */
object Urls {

  private val UrlRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(.*)$"

  private def trackingParam(p: Column): Column =
    p.startsWith("utm_") || p.startsWith("fbclid=") ||
      p.startsWith("gclid=") || p.startsWith("msclkid=") ||
      p.startsWith("ref=") || (p === "")

  /** Canonical form of `url`; null for strings that do not parse as
    * absolute `scheme://authority...` URLs (no guessing — a relative
    * or garbage "URL" must not silently canonicalize to itself).
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val host0 = lower(regexp_extract(url, UrlRe, 2))
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path0 = regexp_replace(regexp_extract(url, UrlRe, 3), "/{2,}", "/")
    val path = when(path0 === "" , lit("/"))
      .when(path0 =!= "/", regexp_replace(path0, "/$", ""))
      .otherwise(path0)
    // tail = "?query#frag" | "?query" | "#frag" | ""; keep query only
    val tail = regexp_extract(url, UrlRe, 4)
    val query = regexp_extract(tail, "^\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"), p => !trackingParam(p))), "&")
    when(scheme === "" || host0 === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(params === "", lit("")).otherwise(concat(lit("?"), params))))
  }
}
