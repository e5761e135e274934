package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared single-pass HTML scanner for [[HtmlToText]] and
  * [[HtmlLinks]]: one deterministic automaton walk per document, no
  * DOM, no allocation beyond the output — the only shape that works as
  * the first stage of a 100 TB web-crawl ingest, where markup
  * stripping runs before ANY other text operator can.
  *
  * The dialect is fixed and documented so the DuckDB oracle can state
  * closed-form expectations and the hostile-input specs can pin every
  * edge:
  *   - `<!--` comments are dropped through `-->` (to end if
  *     unterminated);
  *   - `<![CDATA[` content is literal text through `]]>` (to end if
  *     unterminated), never entity-decoded;
  *   - `<script`/`<style` elements are dropped whole, through the
  *     matching case-insensitive `</script`/`</style` — where the char
  *     after the name must end a tag name (whitespace, '>', '/', or
  *     end of input), so `</scripture>` does NOT close a `<script>`,
  *     symmetric with the open side — and that tag's `>` (to end if
  *     unterminated); a `<` inside code never opens a tag;
  *   - any other `<` followed by `[A-Za-z!/?]` is a tag: skipped to
  *     the closing `>`, where `>` inside a single- or double-quoted
  *     attribute value does NOT close the tag; an unterminated tag
  *     drops the rest of the input (truncated fetch behavior);
  *   - a `<` followed by anything else is literal text (the lenient
  *     browser rule);
  *   - text runs decode `&amp; &lt; &gt; &quot; &apos; &nbsp;` and
  *     numeric `&#NNN;` / `&#xHH;` references (code points 1..10FFFF
  *     excluding surrogates); anything else after `&` — unknown name,
  *     invalid code point, or no `;` within 12 chars — stays literal.
  */
private object HtmlWalk {

  /** Elements whose content is dropped whole. */
  private val rawSkip = Seq("script", "style")

  def isLetter(c: Char): Boolean = isAsciiLetter(c)

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def lower(c: Char): Char =
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c

  /** True when `s` at `i` starts the ASCII-case-insensitive `word`
    * AND the char after it ends a tag name (whitespace, '>', '/', or
    * end of input) — so `<scripture>` is NOT a script element.
    */
  private def tagNameAt(s: String, i: Int, word: String): Boolean = {
    if (i + word.length > s.length) return false
    var k = 0
    while (k < word.length) {
      if (lower(s.charAt(i + k)) != word.charAt(k)) return false
      k += 1
    }
    val j = i + word.length
    j >= s.length || s.charAt(j) == '>' || s.charAt(j) == '/' ||
      Character.isWhitespace(s.charAt(j))
  }

  /** Index just past the `>` closing the tag that starts at `lt`
    * (s(lt) == '<'), honoring quoted attribute values; -1 when the tag
    * never closes.
    */
  private def tagEnd(s: String, lt: Int): Int = {
    var i = lt + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') {
        i += 1
        while (i < s.length && s.charAt(i) != c) i += 1
        if (i >= s.length) return -1 // unterminated quote eats the rest
        i += 1
      } else if (c == '>') return i + 1
      else i += 1
    }
    -1
  }

  /** Index just past the case-insensitive `needle` starting the search
    * at `from`; -1 when absent.
    */
  private def indexOfCi(s: String, needle: String, from: Int): Int = {
    var i = from
    val last = s.length - needle.length
    while (i <= last) {
      var k = 0
      while (k < needle.length && lower(s.charAt(i + k)) == needle.charAt(k))
        k += 1
      if (k == needle.length) return i + needle.length
      i += 1
    }
    -1
  }

  /** Decode one entity at `amp` (s(amp) == '&'). Returns the decoded
    * string and the index after the reference, or null when the run is
    * not a valid reference (caller emits the literal '&').
    */
  private def entityAt(s: String, amp: Int): (String, Int) = {
    val semi = s.indexOf(';', amp + 1)
    if (semi < 0 || semi > amp + 12) return null
    val body = s.substring(amp + 1, semi)
    val decoded: String = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if body.length >= 2 && body.charAt(0) == '#' =>
        val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
        val digits = if (hex) body.substring(2) else body.substring(1)
        val radix = if (hex) 16 else 10
        if (digits.isEmpty) null
        else try {
          val cp = Integer.parseInt(digits, radix)
          if (cp < 1 || cp > 0x10FFFF ||
            (cp >= 0xD800 && cp <= 0xDFFF)) null
          else new String(Character.toChars(cp))
        } catch { case _: NumberFormatException => null }
      case _ => null
    }
    if (decoded == null) null else (decoded, semi + 1)
  }

  /** Entity-decode a bare string (attribute-value rules: no tags
    * exist inside a value, only references).
    */
  def decodeEntities(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val e = entityAt(s, i)
        if (e == null) { out.append('&'); i += 1 }
        else { out.append(e._1); i = e._2 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** One walk; `onText` receives decoded text fragments (CDATA comes
    * through literally), `onTag` the tag-name (lowercase, leading '/'
    * kept) and the [lt, end) source span of each real tag.
    */
  def walk(s: String, onText: String => Unit,
           onTag: (String, Int, Int) => Unit): Unit = {
    val n = s.length
    var i = 0
    val text = new java.lang.StringBuilder
    def flush(): Unit =
      if (text.length > 0) { onText(text.toString); text.setLength(0) }
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          flush()
          onTag("!--", i, math.min(n, i + 4)) // a boundary, like a tag
          i = if (end < 0) n else end + 3
        } else if (s.startsWith("<![CDATA[", i)) {
          val end = s.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          text.append(s, i + 9, stop) // literal, no entity decode
          i = if (end < 0) n else end + 3
        } else if (rawSkip.exists(w => tagNameAt(s, i + 1, w))) {
          val w = rawSkip.filter(x => tagNameAt(s, i + 1, x)).head
          flush()
          onTag(w, i, math.min(n, i + 1 + w.length))
          // the close tag needs the same name boundary the open side
          // enforces: `</scripture>` must NOT terminate a <script>
          // element (browser rule, symmetric with tagNameAt)
          var close = -1
          var from = i + 1
          while (close < 0 && from <= n) {
            val hit = indexOfCi(s, "</" + w, from)
            if (hit < 0) from = n + 1
            else if (hit >= n || s.charAt(hit) == '>' ||
                s.charAt(hit) == '/' || Character.isWhitespace(s.charAt(hit)))
              close = hit
            else from = hit - w.length - 1 // resume past the failed '<'
          }
          if (close < 0) i = n
          else {
            val gt = s.indexOf('>', close)
            i = if (gt < 0) n else gt + 1
          }
        } else if (i + 1 < n && (isAsciiLetter(s.charAt(i + 1)) ||
            s.charAt(i + 1) == '!' || s.charAt(i + 1) == '/' ||
            s.charAt(i + 1) == '?')) {
          val end = tagEnd(s, i)
          if (end < 0) { flush(); return } // truncated tag eats the rest
          var j = i + 1
          val name = new java.lang.StringBuilder
          if (s.charAt(j) == '/') { name.append('/'); j += 1 }
          while (j < end - 1 && (isAsciiLetter(s.charAt(j)) ||
              (s.charAt(j) >= '0' && s.charAt(j) <= '9'))) {
            name.append(lower(s.charAt(j))); j += 1
          }
          flush()
          onTag(name.toString, i, end)
          i = end
        } else {
          text.append('<'); i += 1 // lone '<' is text
        }
      } else if (c == '&') {
        val e = entityAt(s, i)
        if (e == null) { text.append('&'); i += 1 }
        else { text.append(e._1); i = e._2 }
      } else {
        text.append(c); i += 1
      }
    }
    flush()
  }
}

/** Markup → clean text: drop tags/comments/script/style, decode
  * entities, collapse ALL whitespace runs to single spaces, trim — the
  * first operator of a web-crawl training-data pipeline, feeding the
  * existing boilerplate/quality/dedup stages that start at clean text.
  * Every tag is a word boundary (the collapse step makes block/inline
  * distinctions moot for downstream token statistics). CodegenFallback:
  * the automaton walk dominates, not dispatch.
  */
case class HtmlToText(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_to_text requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_to_text"

  protected override def nullSafeEval(input: Any): Any = {
    val out = new java.lang.StringBuilder
    HtmlWalk.walk(input.toString,
      onText = t => out.append(t),
      onTag = (_, _, _) => out.append(' ')) // every tag a word boundary
    // collapse whitespace runs (incl. decoded nbsp and source newlines)
    val s = out
    val res = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingGap = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) pendingGap = res.length > 0
      else {
        if (pendingGap) { res.append(' '); pendingGap = false }
        res.append(c)
      }
      i += 1
    }
    UTF8String.fromString(res.toString)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlToText = copy(child = newChild)
}

/** Outlink extraction: href attribute values of `<a>` tags in document
  * order, entity-decoded (href="?a=1&amp;b=2" arrives as a=1&b=2),
  * from the same scanner — links inside comments or script never
  * count. Quoted values may hold any char but the quote; unquoted
  * values end at whitespace or '>'. Feeds the URL-canonicalization /
  * frontier operators ([[graft.functions.Urls]]). CodegenFallback: the
  * walk dominates.
  */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_links requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_html_links"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val found = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    HtmlWalk.walk(s, onText = _ => (), onTag = (name, lt, end) => {
      if (name == "a") {
        val href = hrefIn(s, lt, end)
        if (href != null) found += UTF8String.fromString(href)
      }
    })
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(found.toArray)
  }

  private def hrefIn(s: String, lt: Int, end: Int): String =
    HtmlAttr.attrIn(s, lt, end, "href")

  override protected def withNewChildInternal(
      newChild: Expression): HtmlLinks = copy(child = newChild)
}

/** Attribute extraction shared by [[HtmlLinks]] and [[HtmlRefs]]. */
private[expressions] object HtmlAttr {

  /** Value of the first case-insensitive `name` attribute inside the
    * tag span [lt, end), entity-decoded; null when absent. The name
    * must be preceded by whitespace and followed (after optional
    * whitespace) by '=', so `hreflang` never matches `href`; quoted
    * values of OTHER attributes are skipped whole, so a decoy
    * `title="href=x"` cannot match.
    */
  def attrIn(s: String, lt: Int, end: Int, name: String): String = {
    val n = name.length
    var i = lt + 1
    while (i < end - 1) {
      val c = s.charAt(i)
      if (c == '"' || c == '\'') { // quoted value of some attribute
        i += 1
        while (i < end - 1 && s.charAt(i) != c) i += 1
        i += 1
      } else if (Character.isWhitespace(c) && i + 1 + n <= end &&
          s.regionMatches(true, i + 1, name, 0, n)) {
        var j = i + 1 + n
        while (j < end - 1 && Character.isWhitespace(s.charAt(j))) j += 1
        if (j < end - 1 && s.charAt(j) == '=') {
          j += 1
          while (j < end - 1 && Character.isWhitespace(s.charAt(j))) j += 1
          if (j >= end - 1) return null
          val q = s.charAt(j)
          val raw = if (q == '"' || q == '\'') {
            val stop = s.indexOf(q, j + 1)
            if (stop < 0 || stop > end - 1) return null
            s.substring(j + 1, stop)
          } else {
            var k = j
            while (k < end - 1 && !Character.isWhitespace(s.charAt(k)) &&
              s.charAt(k) != '>') k += 1
            s.substring(j, k)
          }
          return HtmlWalk.decodeEntities(raw)
        } else i += 1
      } else i += 1
    }
    null
  }
}

/** Typed outlink/reference extraction for a crawl frontier — the
  * [[HtmlLinks]] scanner widened to every reference a crawler tracks,
  * as (kind, url) structs in document order:
  *
  *   - `a`   — `<a href>` (the frontier candidates);
  *   - `img` — `<img src>` (media fetch queue);
  *   - `canonical` — `<link rel="canonical" href>` (the page's own
  *     preferred URL, the dedup hint crawlers honor);
  *
  * each resolved against the document's FIRST `<base href>` whose
  * value is an absolute `scheme://authority...` URL (applied to every
  * reference in the document — the pre-HTML5 rule, and what a crawler
  * wants: one base per page). Resolution dialect (fixed so the DuckDB
  * oracle can state closed forms):
  *
  *   - a url with its own scheme (`name:`) passes through;
  *   - `//host/...` takes the base scheme;
  *   - `/path` takes scheme://authority;
  *   - empty or `#...` resolves to the base URL as written;
  *   - anything else appends to the base path's directory (up to and
  *     including the last '/'); dot segments are NOT normalized (that
  *     is [[graft.functions.Urls.canonicalizeUrl]]'s layer, which also
  *     owns case/port/tracking-param normalization).
  *
  * Without a usable base, urls pass through as written. References in
  * comments/script/style never count. CodegenFallback: the walk
  * dominates.
  */
case class HtmlRefs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_refs requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("url", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_refs"

  /** True when `u` starts with a URI scheme (letter, then
    * letters/digits/+/-/. up to ':' before any '/', '?' or '#').
    */
  private def hasScheme(u: String): Boolean = {
    if (u.isEmpty || !HtmlWalk.isLetter(u.charAt(0))) return false
    var i = 1
    while (i < u.length) {
      val c = u.charAt(i)
      if (c == ':') return true
      if (!(HtmlWalk.isLetter(c) || (c >= '0' && c <= '9') ||
        c == '+' || c == '-' || c == '.')) return false
      i += 1
    }
    false
  }

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val raws = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var base: String = null
    HtmlWalk.walk(s, onText = _ => (), onTag = (name, lt, end) => name match {
      case "a" =>
        val u = HtmlAttr.attrIn(s, lt, end, "href")
        if (u != null) raws += (("a", u))
      case "img" =>
        val u = HtmlAttr.attrIn(s, lt, end, "src")
        if (u != null) raws += (("img", u))
      case "link" =>
        val rel = HtmlAttr.attrIn(s, lt, end, "rel")
        if (rel != null && rel.trim.equalsIgnoreCase("canonical")) {
          val u = HtmlAttr.attrIn(s, lt, end, "href")
          if (u != null) raws += (("canonical", u))
        }
      case "base" if base == null =>
        val u = HtmlAttr.attrIn(s, lt, end, "href")
        if (u != null && hasScheme(u) && u.indexOf("://") > 0 &&
          u.length > u.indexOf("://") + 3 &&
          "/?#".indexOf(u.charAt(u.indexOf("://") + 3)) < 0) base = u
      case _ => ()
    })
    // split the base once: scheme, authority, path directory
    var scheme: String = null; var auth: String = null; var dir: String = null
    if (base != null) {
      val ss = base.indexOf("://")
      scheme = base.substring(0, ss)
      var ae = ss + 3
      while (ae < base.length && "/?#".indexOf(base.charAt(ae)) < 0) ae += 1
      auth = base.substring(ss + 3, ae)
      var pe = ae
      while (pe < base.length && "?#".indexOf(base.charAt(pe)) < 0) pe += 1
      val path = base.substring(ae, pe)
      val slash = path.lastIndexOf('/')
      dir = if (slash < 0) "/" else path.substring(0, slash + 1)
    }
    def resolve(u: String): String =
      if (hasScheme(u) || base == null) u
      else if (u.startsWith("//")) scheme + ":" + u
      else if (u.startsWith("/")) scheme + "://" + auth + u
      else if (u.isEmpty || u.charAt(0) == '#') base
      else scheme + "://" + auth + dir + u
    val rows = raws.map { case (kind, u) =>
      org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(kind), UTF8String.fromString(resolve(u)))
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlRefs = copy(child = newChild)
}

/** Table extraction: (table, row, col, header, text) cells from
  * `<table>/<tr>/<td|th>` markup, in document order — tables are the
  * densest structured training data a crawl carries, and stripping
  * them to prose (HtmlToText) loses the grid. Same single-pass walk;
  * dialect (fixed for the oracle):
  *
  *   - `<table>` advances the table index and resets the row counter;
  *     `<tr>` advances the row and resets the column; `<td>`/`<th>`
  *     opens a cell (header = th);
  *   - a cell closes at `</td>`, `</th>`, or the next cell/row/table
  *     boundary (the browser's implied-close rule);
  *   - cell text is entity-decoded and whitespace-collapsed exactly
  *     like [[HtmlToText]] (nested inline tags become word
  *     boundaries); text outside a cell never counts;
  *   - `colspan`/`rowspan` are parsed (leading decimal digits; absent,
  *     non-numeric or 0 ⇒ 1; clamped to ≤ 1000) and drive COLUMN
  *     ASSIGNMENT per the HTML5 table-forming algorithm: a new cell
  *     lands on the first column not covered by a rowspan from an
  *     earlier row, and advances the next cell by its colspan. A
  *     spanned cell is EMITTED ONCE, at its origin (row, col) — the
  *     covered slots shift later cells' indices but produce no
  *     duplicate rows;
  *   - nested tables flatten into the outer numbering (each `<table>`
  *     resets the pending-rowspan state).
  */
case class HtmlTables(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_tables requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tbl", IntegerType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("header", BooleanType, nullable = false),
    StructField("text", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_tables"

  private def collapse(s: CharSequence): String = HtmlCellText.collapse(s)

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var tbl = -1; var row = -1; var col = -1; var nextCol = 0
    var inCell = false; var header = false
    // column -> last row index still covered by a rowspan from above
    val covered = scala.collection.mutable.Map.empty[Int, Int]
    val buf = new java.lang.StringBuilder
    def closeCell(): Unit = if (inCell) {
      rows += org.apache.spark.sql.catalyst.InternalRow(
        tbl, row, col, header, UTF8String.fromString(collapse(buf)))
      buf.setLength(0)
      inCell = false
    }
    /** colspan/rowspan value: leading decimal digits of the attribute;
      * absent, non-numeric or 0 -> 1; clamped to <= 1000.
      */
    def spanAttr(lt: Int, end: Int, attr: String): Int = {
      val v = HtmlAttr.attrIn(s, lt, end, attr)
      if (v == null) 1
      else {
        val t = v.trim
        var i = 0; var n = 0
        while (i < t.length && n <= 1000 &&
          t.charAt(i) >= '0' && t.charAt(i) <= '9') {
          n = n * 10 + (t.charAt(i) - '0'); i += 1
        }
        if (n < 1) 1 else math.min(n, 1000)
      }
    }
    HtmlWalk.walk(s,
      onText = t => if (inCell) buf.append(t),
      onTag = (name, lt, end) => name match {
        case "table" =>
          closeCell(); tbl += 1; row = -1; col = -1; nextCol = 0
          covered.clear()
        case "tr" if tbl >= 0 => closeCell(); row += 1; nextCol = 0
        case "td" | "th" if tbl >= 0 && row >= 0 =>
          closeCell()
          // HTML5 forming: land on the first slot free of rowspans
          var c = nextCol
          while (covered.get(c).exists(_ >= row)) c += 1
          col = c
          val w = spanAttr(lt, end, "colspan")
          val h = spanAttr(lt, end, "rowspan")
          nextCol = c + w
          if (h > 1) {
            var j = c
            while (j < c + w) { covered(j) = row + h - 1; j += 1 }
          }
          inCell = true; header = name == "th"
        case "/td" | "/th" | "/tr" | "/table" => closeCell()
        case _ => if (inCell) buf.append(' ') // inline tag = boundary
      })
    closeCell()
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlTables = copy(child = newChild)
}

/** Metadata extraction: `<meta name|property=... content=...>` pairs
  * in document order (`name` wins when both attributes are present) —
  * the page's own declared metadata: description/keywords, OpenGraph
  * fields, and the `robots` directives (noindex/nofollow) a polite
  * crawler must honor BEFORE ingesting or following anything. Tags in
  * comments/script never count; values entity-decode.
  */
case class HtmlMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_meta requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("content", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_meta"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val out = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    HtmlWalk.walk(s, onText = _ => (), onTag = (name, lt, end) => {
      if (name == "meta") {
        val nm = {
          val n = HtmlAttr.attrIn(s, lt, end, "name")
          if (n != null) n else HtmlAttr.attrIn(s, lt, end, "property")
        }
        val content = HtmlAttr.attrIn(s, lt, end, "content")
        if (nm != null && content != null)
          out += org.apache.spark.sql.catalyst.InternalRow(
            UTF8String.fromString(nm), UTF8String.fromString(content))
      }
    })
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlMeta = copy(child = newChild)
}

/** Document outline extraction: (level, text) for `<h1>`..`<h6>` in
  * document order — the section structure a long-document chunker
  * aligns to (split-at-headings beats split-at-token-counts for
  * retrieval corpora). Same single-pass walk; dialect (fixed for the
  * oracle): a heading closes at its own end tag, at the NEXT heading
  * open (the implied-close rule), or at end of input; inline tags
  * inside become word boundaries; text outside headings never counts;
  * comments/script are excluded by the walk. Entity-decoded,
  * whitespace-collapsed like [[HtmlToText]].
  */
case class HtmlHeadings(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_headings requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("level", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_headings"

  protected override def nullSafeEval(input: Any): Any = {
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var level = 0
    val buf = new java.lang.StringBuilder
    def close(): Unit = if (level > 0) {
      rows += org.apache.spark.sql.catalyst.InternalRow(
        level, UTF8String.fromString(HtmlCellText.collapse(buf)))
      buf.setLength(0)
      level = 0
    }
    HtmlWalk.walk(input.toString,
      onText = t => if (level > 0) buf.append(t),
      onTag = (name, _, _) => name match {
        case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
          close(); level = name.charAt(1) - '0'
        case "/h1" | "/h2" | "/h3" | "/h4" | "/h5" | "/h6" => close()
        case _ => if (level > 0) buf.append(' ') // inline = boundary
      })
    close()
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlHeadings = copy(child = newChild)
}

/** List extraction: (lst, item, depth, ordered, text) for
  * `<ul>/<ol>/<li>` markup in document order — bullet content is
  * dense instruction-style training data that HtmlToText flattens
  * into undifferentiated prose. Same walk; dialect:
  *
  *   - `<ul>`/`<ol>` opens a list (global index in document order,
  *     depth = nesting level) and `</ul>`/`</ol>` closes it;
  *   - `<li>` opens an item of the CURRENT (innermost) list, 0-based;
  *     it closes at `</li>`, the next `<li>`, a nested list open, or
  *     the list's close (implied-close rules) — so an item's text
  *     stops at a nested list and tail text after the nested list is
  *     not re-attached;
  *   - `<li>` outside any open list never counts; inline tags are
  *     word boundaries; entity-decode + whitespace-collapse as
  *     everywhere.
  */
case class HtmlLists(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_lists requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lst", IntegerType, nullable = false),
    StructField("item", IntegerType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("ordered", BooleanType, nullable = false),
    StructField("text", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_lists"

  protected override def nullSafeEval(input: Any): Any = {
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    // open lists: (global list idx, ordered, items emitted so far)
    final case class L(idx: Int, ordered: Boolean, var n: Int)
    val stack = scala.collection.mutable.ArrayBuffer.empty[L]
    var nextList = 0
    var inItem = false
    var curLst = 0; var curItem = 0; var curDepth = 0
    var curOrdered = false
    val buf = new java.lang.StringBuilder
    def closeItem(): Unit = if (inItem) {
      rows += org.apache.spark.sql.catalyst.InternalRow(
        curLst, curItem, curDepth, curOrdered,
        UTF8String.fromString(HtmlCellText.collapse(buf)))
      buf.setLength(0)
      inItem = false
    }
    HtmlWalk.walk(input.toString,
      onText = t => if (inItem) buf.append(t),
      onTag = (name, _, _) => name match {
        case "ul" | "ol" =>
          closeItem()
          stack += L(nextList, name == "ol", 0)
          nextList += 1
        case "/ul" | "/ol" =>
          closeItem()
          if (stack.nonEmpty) stack.remove(stack.length - 1)
        case "li" if stack.nonEmpty =>
          closeItem()
          val top = stack.last
          curLst = top.idx; curItem = top.n; curDepth = stack.length
          curOrdered = top.ordered
          top.n += 1
          inItem = true
        case "/li" => closeItem()
        case _ => if (inItem) buf.append(' ') // inline = boundary
      })
    closeItem()
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlLists = copy(child = newChild)
}

/** Section segmentation: (level, heading, body) — the document cut at
  * every heading, each section carrying its own heading text and the
  * prose until the next heading. This is the heading-ALIGNED chunking
  * a retrieval corpus wants (split at structure, not at token counts);
  * the ancestor path (h1 ▸ h2 ▸ …) reconstructs downstream with one
  * keyed window over the section sequence (`t_section_chunks`).
  * Dialect: any `<h1>`..`<h6>` open starts a NEW section (flat
  * segmentation — hierarchy is the consumer's fold); text before the
  * first heading is a level-0 preamble section (emitted only when
  * non-empty); the heading's own text captures exactly like
  * [[HtmlHeadings]] — it ends at its end tag (implied close: the
  * next heading or end of input), with inline tags as word
  * boundaries; comments/script excluded by the walk; entity-decode +
  * whitespace-collapse as everywhere.
  */
case class HtmlSections(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_html_sections requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("level", IntegerType, nullable = false),
    StructField("heading", StringType, nullable = false),
    StructField("body", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_html_sections"

  protected override def nullSafeEval(input: Any): Any = {
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    var level = 0
    var inHeading = false
    val headBuf = new java.lang.StringBuilder
    val bodyBuf = new java.lang.StringBuilder
    def emit(): Unit = {
      val h = HtmlCellText.collapse(headBuf)
      val b = HtmlCellText.collapse(bodyBuf)
      // the level-0 preamble only exists when it has content
      if (level > 0 || h.nonEmpty || b.nonEmpty)
        rows += org.apache.spark.sql.catalyst.InternalRow(
          level, UTF8String.fromString(h), UTF8String.fromString(b))
      headBuf.setLength(0); bodyBuf.setLength(0)
    }
    HtmlWalk.walk(input.toString,
      onText = t => (if (inHeading) headBuf else bodyBuf).append(t),
      onTag = (name, _, _) => name match {
        case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" =>
          emit(); level = name.charAt(1) - '0'; inHeading = true
        case "/h1" | "/h2" | "/h3" | "/h4" | "/h5" | "/h6" =>
          inHeading = false
        case _ =>
          (if (inHeading) headBuf else bodyBuf).append(' ')
      })
    emit()
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): HtmlSections = copy(child = newChild)
}

/** Shared whitespace-collapse for captured cell/heading/item text. */
private[expressions] object HtmlCellText {
  def collapse(s: CharSequence): String = {
    val res = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingGap = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) pendingGap = res.length > 0
      else {
        if (pendingGap) { res.append(' '); pendingGap = false }
        res.append(c)
      }
      i += 1
    }
    res.toString
  }
}

object HtmlExprs {
  def htmlToText(s: Column): Column =
    Bridge.column(HtmlToText(Bridge.expression(s)))
  def htmlLinks(s: Column): Column =
    Bridge.column(HtmlLinks(Bridge.expression(s)))
  def htmlRefs(s: Column): Column =
    Bridge.column(HtmlRefs(Bridge.expression(s)))
  def htmlTables(s: Column): Column =
    Bridge.column(HtmlTables(Bridge.expression(s)))
  def htmlMeta(s: Column): Column =
    Bridge.column(HtmlMeta(Bridge.expression(s)))
  def htmlHeadings(s: Column): Column =
    Bridge.column(HtmlHeadings(Bridge.expression(s)))
  def htmlLists(s: Column): Column =
    Bridge.column(HtmlLists(Bridge.expression(s)))
  def htmlSections(s: Column): Column =
    Bridge.column(HtmlSections(Bridge.expression(s)))
}
