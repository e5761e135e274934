package graft

import org.apache.spark.sql.functions._

import graft.functions.Robots

/** Hostile-input pins for the robots.txt column-algebra parser and the
  * longest-match gate — every documented dialect rule gets the case
  * that would break a lazier parser.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def rules(txt: String, agent: String = "graft")
      : Seq[(Boolean, String)] =
    Seq(txt).toDF("t").select(Robots.parseRules(col("t"), agent))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getBoolean(0), r.getString(1)))

  private def allowed(txt: String, path: String): Boolean =
    Seq((txt, path)).toDF("t", "p")
      .select(Robots.isAllowed(Robots.parseRules(col("t")), col("p")))
      .head().getBoolean(0)

  test("parse: groups, case, comments, shared UA lines, decoys") {
    val txt =
      """# policy
        |User-Agent: Other-Bot
        |Disallow: /
        |
        |user-agent: *
        |DISALLOW: /p/
        |Allow: /p/open
        |""".stripMargin
    // the other-bot group never applies; directives are case-blind
    assert(rules(txt) === Seq((false, "/p/"), (true, "/p/open")))
    // consecutive UA lines share one group
    assert(rules("User-agent: a\nUser-agent: *\nDisallow: /x") ===
      Seq((false, "/x")))
    // a rule closes the agent list: a later UA starts a NEW group
    assert(rules("User-agent: *\nDisallow: /a\nUser-agent: b\nDisallow: /c") ===
      Seq((false, "/a")))
    // rules before any UA line belong to no group and are dropped
    assert(rules("Disallow: /orphan\nUser-agent: *\nDisallow: /x") ===
      Seq((false, "/x")))
    // empty Disallow (allow-all idiom) is a no-op rule
    assert(rules("User-agent: *\nDisallow:\nDisallow: /y") ===
      Seq((false, "/y")))
    // unknown directives and blank lines are ignored
    assert(rules("User-agent: *\nCrawl-delay: 5\nDisallow: /z") ===
      Seq((false, "/z")))
    // a crawl-delay line closes the open agent list (the SAME
    // segmentation crawlDelay folds): the Disallow below attributes
    // to b's new group, not to a
    assert(rules("User-agent: a\nCrawl-delay: 3\nUser-agent: b\n" +
      "Disallow: /x", agent = "a") === Seq.empty)
    assert(rules("User-agent: a\nCrawl-delay: 3\nUser-agent: b\n" +
      "Disallow: /x", agent = "b") === Seq((false, "/x")))
  }

  test("sitemapUrls: group-independent, ordered, comments and empties drop") {
    def sm(txt: String): Seq[String] =
      Seq(txt).toDF("t").select(Robots.sitemapUrls(col("t")))
        .head().getSeq[String](0)
    // declarations surface regardless of surrounding groups, in file
    // order; the value keeps its own scheme colon; case-blind
    // directive; padded whitespace trims; an empty value drops; a
    // commented line never counts
    assert(sm("User-agent: *\nDisallow: /x\n" +
      "Sitemap: https://a.org/s1.xml\n" +
      "User-agent: other\nSITEMAP:   https://a.org/s2.xml  \n" +
      "Sitemap:\n# Sitemap: https://no.org/c.xml") ===
      Seq("https://a.org/s1.xml", "https://a.org/s2.xml"))
    assert(sm("User-agent: *\nDisallow: /") === Seq.empty)
    // a sitemap line does NOT close the open agent group (it is
    // group-independent, unlike rule lines)
    assert(rules("User-agent: a\nSitemap: https://a.org/s.xml\n" +
      "User-agent: *\nDisallow: /x", agent = "a") ===
      Seq((false, "/x")))
  }

  test("parse: agent-specific group replaces the * rules") {
    val txt =
      """User-agent: *
        |Disallow: /p/
        |
        |User-agent: graft
        |Disallow: /d/
        |""".stripMargin
    assert(rules(txt) === Seq((false, "/d/")))
    assert(rules(txt, agent = "nomatch") === Seq((false, "/p/")))
    // ...even when the agent group is EMPTY (explicitly unrestricted)
    assert(rules("User-agent: *\nDisallow: /\nUser-agent: graft\n") ===
      Seq.empty)
  }

  test("gate: longest match wins, Allow beats Disallow on ties") {
    val txt = "User-agent: *\nDisallow: /p/\nAllow: /p/open\n"
    assert(!allowed(txt, "/p/secret"))
    assert(allowed(txt, "/p/open123"))
    assert(allowed(txt, "/d/anything")) // no matching rule
    // exact tie in prefix length: allow wins
    val tie = "User-agent: *\nDisallow: /ab\nAllow: /ab\n"
    assert(allowed(tie, "/abc"))
    // Disallow: / blocks everything
    assert(!allowed("User-agent: *\nDisallow: /\n", "/any"))
  }

  test("crawlDelay: group semantics, last wins, garbage ignored") {
    def delay(txt: String): Option[Long] = {
      val r = Seq(txt).toDF("t")
        .select(Robots.crawlDelay(col("t"))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }
    assert(delay("User-agent: *\nCrawl-delay: 5\nDisallow: /x") === Some(5L))
    // the agent-specific group replaces the * delay
    assert(delay("User-agent: *\nCrawl-delay: 5\n\n" +
      "User-agent: graft\nCrawl-delay: 2\n") === Some(2L))
    // ...and an agent group WITHOUT a delay means no delay applies
    assert(delay("User-agent: *\nCrawl-delay: 5\n\n" +
      "User-agent: graft\nDisallow: /d/\n") === None)
    // last applicable delay wins; non-numeric values are ignored
    assert(delay("User-agent: *\nCrawl-delay: 5\nCrawl-delay: 9") ===
      Some(9L))
    assert(delay("User-agent: *\nCrawl-delay: soon") === None)
    // other bots' delays never apply; none at all -> null
    assert(delay("User-agent: other\nCrawl-delay: 7") === None)
    assert(delay("# nothing here") === None)
    // a crawl-delay closes the agent list like any rule line
    assert(delay("User-agent: a\nCrawl-delay: 3\nUser-agent: *\n" +
      "Crawl-delay: 4") === Some(4L))
  }

  test("urlPath extracts the path ('/' when empty)") {
    val got = Seq("https://h.io/a/b?q=1#f", "https://h.io", "http://h.io/")
      .toDF("u").select(Robots.urlPath(col("u"))).collect()
      .map(_.getString(0)).toSeq
    assert(got === Seq("/a/b", "/", "/"))
  }
}
