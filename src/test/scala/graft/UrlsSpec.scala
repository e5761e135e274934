package graft

import org.apache.spark.sql.functions._

import graft.functions.Urls

/** URL canonicalization: each rule in isolation plus the no-guessing
  * null contract for non-absolute inputs. */
class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
  }

  test("scheme/host lowercase, default ports dropped, non-default kept") {
    assert(canon(
      "HTTP://EXAMPLE.COM/x",
      "http://example.com:80/x",
      "https://example.com:443/x",
      "https://example.com:8443/x",
      "http://example.com:443/x") === Seq(  // 443 is NOT http's default
      "http://example.com/x",
      "http://example.com/x",
      "https://example.com/x",
      "https://example.com:8443/x",
      "http://example.com:443/x"))
  }

  test("path: slashes collapse, trailing slash drops, root and empty stay /") {
    assert(canon(
      "https://h.com/a//b///c/",
      "https://h.com/",
      "https://h.com",
      "https://h.com//") === Seq(
      "https://h.com/a/b/c",
      "https://h.com/",
      "https://h.com/",
      "https://h.com/"))
  }

  test("query: tracking params drop, rest sort, fragment drops") {
    assert(canon(
      "https://h.com/p?utm_source=x&b=2&a=1&gclid=g#frag",
      "https://h.com/p?a=1&b=2",
      "https://h.com/p?b=2&a=1",
      "https://h.com/p?utm_campaign=only",
      "https://h.com/p#frag") === Seq(
      "https://h.com/p?a=1&b=2",
      "https://h.com/p?a=1&b=2",
      "https://h.com/p?a=1&b=2",   // order-insensitive = same canonical
      "https://h.com/p",           // all params tracked away
      "https://h.com/p"))
  }

  test("non-absolute or garbage input is null, never guessed") {
    assert(canon("not a url", "/relative/path", "", "example.com/x")
      === Seq(null, null, null, null))
  }
}
