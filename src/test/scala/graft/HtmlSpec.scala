package graft

import org.apache.spark.sql.functions._

import graft.expressions.HtmlExprs

/** Hostile-input pins for the HTML → text / link extraction
  * expressions: every documented dialect rule gets the adversarial
  * case that would break a lazier parser — unclosed tags, quotes
  * spanning `>`, nested CDATA, raw `<` inside script, entity edge
  * cases, decoy links in comments.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def text(html: String): String =
    Seq(html).toDF("h").select(HtmlExprs.htmlToText(col("h")))
      .head().getString(0)

  private def links(html: String): Seq[String] =
    Seq(html).toDF("h").select(HtmlExprs.htmlLinks(col("h")))
      .head().getSeq[String](0)

  test("tags strip, entities decode, whitespace collapses") {
    assert(text("<p>a<b>b</b> c</p>") == "a b c")
    assert(text("  a\n\t b  ") == "a b")
    assert(text("x &amp; y &lt;z&gt; &quot;q&quot; &apos;a&apos;") ==
      "x & y <z> \"q\" 'a'")
    assert(text("a&nbsp;b") == "a b")
    assert(text("&#65;&#x42;&#X43;") == "ABC")
  }

  test("invalid or incomplete entities stay literal") {
    assert(text("fish & chips") == "fish & chips")
    assert(text("&unknown;") == "&unknown;")
    assert(text("&amp") == "&amp") // no semicolon
    assert(text("&#;") == "&#;")
    assert(text("&#0;x") == "&#0;x") // NUL rejected
    assert(text("&#xD800;") == "&#xD800;") // surrogate rejected
    assert(text("&#1114112;") == "&#1114112;") // > U+10FFFF
    // a semicolon too far away (> 12 chars) never forms a reference
    assert(text("&aaaaaaaaaaaaaaa;") == "&aaaaaaaaaaaaaaa;")
  }

  test("script/style content is dropped even with fake markup inside") {
    assert(text("a<script>if (1<2) alert('<b>x</b>')</script>b") == "a b")
    assert(text("a<style>p::before { content: \"<i>y</i>\" }</style>b")
      == "a b")
    assert(text("a<SCRIPT>x</ScRiPt >y") == "a y") // case-insensitive
    // an unterminated script eats the rest (truncated fetch)
    assert(text("a<script>var x = 1; b c") == "a")
    // ...but <scripture> is an ordinary tag, not a script element
    assert(text("<scripture>word</scripture>") == "word")
    // the close side carries the same name boundary: </scripture> does
    // NOT terminate a <script> element — payload after it stays dropped
    assert(text("a<script>x</scripture>leak</script>b") == "a b")
    assert(text("a<script>x</scriptpaïen</script>b") == "a b")
    // whitespace and self-closing forms DO close it
    assert(text("a<script>x</script\t>b") == "a b")
    assert(text("a<script>x</script/>b") == "a b")
    // a boundary-failing close followed by NO real close eats the rest
    assert(text("a<script>x</scripture>tail") == "a")
  }

  test("comments, CDATA, and lenient lone '<'") {
    assert(text("a<!-- <p>fake</p> -->b") == "a b")
    assert(text("a<!-- unterminated") == "a")
    assert(text("<![CDATA[raw <tags> & no decode]]>") ==
      "raw <tags> & no decode")
    // the first ]]> ends the block; the rest is ordinary text that
    // concatenates with the block (CDATA is a text node, no boundary)
    assert(text("<![CDATA[a<![CDATA[b]]>c]]>") == "a<![CDATA[bc]]>")
    assert(text("<![CDATA[never closes") == "never closes")
    assert(text("1 < 2 and x <= y") == "1 < 2 and x <= y")
  }

  test("attribute quoting: '>' inside quotes does not close the tag") {
    assert(text("<p title=\"a>b\">c</p>") == "c")
    assert(text("<p title='a>b'>c</p>") == "c")
    // unterminated tag or quote drops the rest of the input
    assert(text("a <em class=") == "a")
    assert(text("a <em class=\"x>b c") == "a")
    assert(text("<!DOCTYPE html><?xml version=\"1.0\"?>ok") == "ok")
  }

  test("links: quoting forms, decoys, entity decode, order") {
    val html = "<a href=\"https://e.org/?a=1&amp;b=2\">x</a>" +
      "<!-- <a href=\"http://comment/c\">n</a> -->" +
      "<script>var s = '<a href=\"http://script/s\">';</script>" +
      "<A HREF='/single quoted'>y</A>" +
      "<a name=\"anchor\">no href</a>" +
      "<a hreflang=\"en\" href=unquoted>z</a>"
    assert(links(html) == Seq("https://e.org/?a=1&b=2",
      "/single quoted", "unquoted"))
    assert(links("<a href = ' spaced = value '>t</a>") ==
      Seq(" spaced = value "))
    assert(links("no anchors here") == Seq.empty)
    // href must be a real attribute name, not a substring of one
    assert(links("<a hreflang=\"en\">t</a>") == Seq.empty)
  }

  private def refs(html: String): Seq[(String, String)] =
    Seq(html).toDF("h").select(HtmlExprs.htmlRefs(col("h")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))

  test("HtmlRefs: typed refs resolve against the first usable base") {
    val base = "<base href=\"https://h.org/a/b/c.html\">"
    // no base: urls pass through as written
    assert(refs("<a href=\"x/y\">t</a><img src=\"/i.png\">") ==
      Seq(("a", "x/y"), ("img", "/i.png")))
    // each resolution rule
    assert(refs(s"$base<a href=\"x/y\">t</a>") ==
      Seq(("a", "https://h.org/a/b/x/y")))
    assert(refs(s"$base<a href=\"/top\">t</a>") ==
      Seq(("a", "https://h.org/top")))
    assert(refs(s"$base<a href=\"//cdn.io/z\">t</a>") ==
      Seq(("a", "https://cdn.io/z")))
    assert(refs(s"$base<a href=\"#frag\">t</a>") ==
      Seq(("a", "https://h.org/a/b/c.html")))
    assert(refs(s"$base<a href=\"mailto:x@y.z\">t</a>") ==
      Seq(("a", "mailto:x@y.z"))) // own scheme passes through
    // base with no path directory resolves relative against '/'
    assert(refs("<base href=\"https://h.org\"><a href=\"p\">t</a>") ==
      Seq(("a", "https://h.org/p")))
    // only the FIRST usable base applies; relative/garbage bases skip
    assert(refs("<base href=\"notaurl\"><base href=\"https://ok.io/d/\">" +
      "<base href=\"https://second.io/\"><a href=\"p\">t</a>") ==
      Seq(("a", "https://ok.io/d/p")))
    // dot segments are NOT normalized at this layer
    assert(refs(s"$base<a href=\"../up\">t</a>") ==
      Seq(("a", "https://h.org/a/b/../up")))
  }

  test("HtmlRefs: canonical link needs rel=canonical; decoys excluded") {
    assert(refs("<link rel=\"canonical\" href=\"https://c.io/p\">" +
      "<link rel=\"stylesheet\" href=\"/s.css\">" +
      "<link href=\"/norel.css\">" +
      "<LINK REL='CANONICAL' HREF='https://c.io/q'>") ==
      Seq(("canonical", "https://c.io/p"), ("canonical", "https://c.io/q")))
    // img needs src; comment/script decoys never count
    assert(refs("<img alt=\"x\"><img src=\"u.jpg\">" +
      "<!-- <a href=\"c\">n</a> --><script>'<img src=\"s\">'</script>") ==
      Seq(("img", "u.jpg")))
    // document order is preserved across kinds
    assert(refs("<a href=\"1\">a</a><img src=\"2\">" +
      "<link rel=\"canonical\" href=\"3\"><a href=\"4\">b</a>")
      .map(_._2) == Seq("1", "2", "3", "4"))
  }

  private def cells(html: String): Seq[(Int, Int, Int, Boolean, String)] =
    Seq(html).toDF("h").select(HtmlExprs.htmlTables(col("h")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getBoolean(3),
        r.getString(4)))

  test("HtmlTables: implied closes, decoys, nesting, truncation") {
    // implied closes: no </td>/</tr> anywhere
    assert(cells("<table><tr><td>a<td>b<tr><td>c</table>") ===
      Seq((0, 0, 0, false, "a"), (0, 0, 1, false, "b"),
        (0, 1, 0, false, "c")))
    // th is a header cell, case-blind; entities decode
    assert(cells("<TABLE><TR><TH>h &amp; i</TH><td>j</td></TR></TABLE>")
      === Seq((0, 0, 0, true, "h & i"), (0, 0, 1, false, "j")))
    // cells outside a table (or rows outside one) never count
    assert(cells("<td>stray</td><tr><td>also</td></tr>") === Seq.empty)
    // a script decoy inside a cell cannot open cells; it is a boundary
    assert(cells("<table><tr><td>x<script>'<td>no</td>'</script>y") ===
      Seq((0, 0, 0, false, "x y")))
    // a truncated document closes the open cell at end-of-input
    assert(cells("<table><tr><td>dangling") ===
      Seq((0, 0, 0, false, "dangling")))
    // nested tables flatten into the outer numbering (documented)
    assert(cells("<table><tr><td>a<table><tr><td>b") ===
      Seq((0, 0, 0, false, "a"), (1, 0, 0, false, "b")))
    // inline markup inside a cell is a word boundary, like HtmlToText
    assert(cells("<table><tr><td>v<b>7</b>x") ===
      Seq((0, 0, 0, false, "v 7 x")))
  }

  test("HtmlTables: colspan/rowspan drive column assignment") {
    // colspan shifts the NEXT cell's index; the spanned cell is
    // emitted once at its origin
    assert(cells("<table><tr><th colspan=\"2\">w</th><th>u</th>" +
      "<tr><td>a<td>b<td>c") ===
      Seq((0, 0, 0, true, "w"), (0, 0, 2, true, "u"),
        (0, 1, 0, false, "a"), (0, 1, 1, false, "b"),
        (0, 1, 2, false, "c")))
    // rowspan covers the slot below: the next row's first cell lands
    // on the first FREE column (the HTML5 forming rule)
    assert(cells("<table><tr><td rowspan=\"2\">tall</td><td>b1</td>" +
      "<tr><td>b2") ===
      Seq((0, 0, 0, false, "tall"), (0, 0, 1, false, "b1"),
        (0, 1, 1, false, "b2")))
    // combined: a 2x2 block pushes both rows' later cells right
    assert(cells("<table><tr><td colspan=\"2\" rowspan=\"2\">blk</td>" +
      "<td>c0</td><tr><td>c1</td><tr><td>d0") ===
      Seq((0, 0, 0, false, "blk"), (0, 0, 2, false, "c0"),
        (0, 1, 2, false, "c1"), (0, 2, 0, false, "d0")))
    // absent, zero, non-numeric, unquoted and clamped values
    assert(cells("<table><tr><td colspan=0>a<td>b") ===
      Seq((0, 0, 0, false, "a"), (0, 0, 1, false, "b")))
    assert(cells("<table><tr><td colspan=\"x\">a<td>b") ===
      Seq((0, 0, 0, false, "a"), (0, 0, 1, false, "b")))
    assert(cells("<table><tr><td colspan=3>a<td>b") ===
      Seq((0, 0, 0, false, "a"), (0, 0, 3, false, "b")))
    // HTML number parsing: leading digits win ("2x" -> 2)
    assert(cells("<table><tr><td colspan=\"2x\">a<td>b") ===
      Seq((0, 0, 0, false, "a"), (0, 0, 2, false, "b")))
    assert(cells("<table><tr><td colspan=\"999999\">a<td>b") ===
      Seq((0, 0, 0, false, "a"), (0, 0, 1000, false, "b")))
    // a new table resets pending rowspans (nested flattening)
    assert(cells("<table><tr><td rowspan=\"9\">a</td></tr></table>" +
      "<table><tr><td>fresh") ===
      Seq((0, 0, 0, false, "a"), (1, 0, 0, false, "fresh")))
  }

  private def heads(html: String): Seq[(Int, String)] =
    Seq(html).toDF("h").select(HtmlExprs.htmlHeadings(col("h")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getString(1)))

  test("HtmlHeadings: levels, implied closes, decoys, truncation") {
    // levels map to the digit; entities decode; inline = boundary
    assert(heads("<h1>A</h1><p>x</p><h3>B &amp; <i>C</i></h3>") ===
      Seq((1, "A"), (3, "B & C")))
    // a new heading implies the previous one's close
    assert(heads("<h2>first<h4>second</h4>") ===
      Seq((2, "first"), (4, "second")))
    // end of input closes a dangling heading
    assert(heads("<h5>dangling") === Seq((5, "dangling")))
    // text outside headings never counts; script/comment decoys skip
    assert(heads("free<h1>t</h1>tail<script>'<h2>no</h2>'</script>" +
      "<!-- <h3>no</h3> -->") === Seq((1, "t")))
    // case-blind
    assert(heads("<H2>up</H2>") === Seq((2, "up")))
  }

  private def items(html: String)
      : Seq[(Int, Int, Int, Boolean, String)] =
    Seq(html).toDF("h").select(HtmlExprs.htmlLists(col("h")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getBoolean(3),
        r.getString(4)))

  test("HtmlLists: nesting, implied closes, ordered flag, strays") {
    // implied closes at the next li; ol sets ordered; list indexes
    // count opens in document order
    assert(items("<ul><li>a<li>b</ul><ol><li>c</li></ol>") ===
      Seq((0, 0, 1, false, "a"), (0, 1, 1, false, "b"),
        (1, 0, 1, true, "c")))
    // nested list: the outer item closes at the nested open; the
    // nested items carry depth 2 and their own list index
    assert(items("<ul><li>outer<ul><li>inner</li></ul></li></ul>") ===
      Seq((0, 0, 1, false, "outer"), (1, 0, 2, false, "inner")))
    // li outside any list never counts
    assert(items("<li>stray</li>") === Seq.empty)
    // truncation closes the open item
    assert(items("<ol><li>dangling") === Seq((0, 0, 1, true, "dangling")))
    // entities decode, inline tags are boundaries
    assert(items("<ul><li>a &amp;<b>b</b>c</li></ul>") ===
      Seq((0, 0, 1, false, "a & b c")))
  }

  private def secs(html: String): Seq[(Int, String, String)] =
    Seq(html).toDF("h").select(HtmlExprs.htmlSections(col("h")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)))

  test("HtmlSections: preamble, heading capture, implied closes, decoys") {
    // preamble before the first heading is a level-0 section; the
    // body runs to the next heading
    assert(secs("pre<h1>T</h1>body one<h2>S</h2>body two") ===
      Seq((0, "", "pre"), (1, "T", "body one"), (2, "S", "body two")))
    // no preamble section when there is nothing before the heading
    assert(secs("<h1>T</h1>x") === Seq((1, "T", "x")))
    // heading capture matches HtmlHeadings: inline tags are
    // boundaries, the implied close is the next heading
    assert(secs("<h2>A &amp; <b>B</b></h2>t<h3>C") ===
      Seq((2, "A & B", "t"), (3, "C", "")))
    // an empty section (heading with no body) still emits
    assert(secs("<h1>a</h1><h2>b</h2>") ===
      Seq((1, "a", ""), (2, "b", "")))
    // script/comment content never leaks into bodies
    assert(secs("<h1>t</h1>x<script>'<h2>no</h2>'</script>y" +
      "<!-- z -->w") === Seq((1, "t", "x y w")))
  }

  private def metas(html: String): Seq[(String, String)] =
    Seq(html).toDF("h").select(HtmlExprs.htmlMeta(col("h")))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getString(1)))

  test("HtmlMeta: name/property precedence, decoys, entities") {
    assert(metas("<meta name=\"a\" content=\"1\">" +
      "<META PROPERTY='og:b' CONTENT='2 &amp; 3'>") ===
      Seq(("a", "1"), ("og:b", "2 & 3")))
    // name wins over property when both are present
    assert(metas("<meta property=\"p\" name=\"n\" content=\"c\">") ===
      Seq(("n", "c")))
    // either half missing -> no pair; comment/script decoys never count
    assert(metas("<meta charset=\"utf-8\"><meta content=\"orphan\">" +
      "<meta name=\"k\">" +
      "<!-- <meta name=\"no\" content=\"no\"> -->" +
      "<script>'<meta name=\"s\" content=\"s\">'</script>") === Seq.empty)
  }

  test("SQL surface: graft_html_to_text / graft_html_links registered") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_html_to_text('<p>a &amp; b</p>') AS t, " +
        "graft_html_links('<a href=\"u\">x</a>') AS l").head()
    assert(r.getString(0) == "a & b")
    assert(r.getSeq[String](1) == Seq("u"))
  }

  test("idempotence on already-clean text; null passes through") {
    assert(text("plain words only") == "plain words only")
    val n = Seq[Option[String]](None).toDF("h")
      .select(HtmlExprs.htmlToText(col("h"))).head()
    assert(n.isNullAt(0))
  }
}
