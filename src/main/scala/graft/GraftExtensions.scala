package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.DotProduct

/** SparkSessionExtensions hook exposing the engine's native expressions
  * to the SQL surface:
  *
  *   spark.sql.extensions=graft.GraftExtensions   (cluster conf), or
  *   SparkSession.builder.withExtensions(new GraftExtensions)
  *
  * then `SELECT graft_dot(a, b)` anywhere SQL is accepted. For an
  * already-running session (tests, notebooks) use
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach(ext.injectFunction)
}

object GraftExtensions {
  private val dotFunction = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_dot(arrA, arrB) takes 2 arguments")
      // accept any numeric array from SQL: cast to array<double> so the
      // primitive ArrayData loop reads 8-byte slots correctly
      val arrD = org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)
      DotProduct(
        org.apache.spark.sql.catalyst.expressions.Cast(args(0), arrD),
        org.apache.spark.sql.catalyst.expressions.Cast(args(1), arrD))
    })

  /** graft_cosine(a, b): the same expression tree Similarity.cosine
    * builds — native dot products with hoistable norms — available
    * from SQL text.
    */
  private val cosineFunction = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_cosine(arrA, arrB) takes 2 arguments")
      val arrD = org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)
      val a = org.apache.spark.sql.catalyst.expressions.Cast(args(0), arrD)
      val b = org.apache.spark.sql.catalyst.expressions.Cast(args(1), arrD)
      org.apache.spark.sql.catalyst.expressions.Divide(
        DotProduct(a, b),
        org.apache.spark.sql.catalyst.expressions.Multiply(
          org.apache.spark.sql.catalyst.expressions.Sqrt(DotProduct(a, a)),
          org.apache.spark.sql.catalyst.expressions.Sqrt(DotProduct(b, b))))
    })

  /** graft_jpeg_dims(binary) → struct(width, height) — the native
    * segment-walking parser under SQL text.
    */
  private val jpegFunction = (
    FunctionIdentifier("graft_jpeg_dims"),
    new ExpressionInfo(classOf[graft.expressions.JpegDims].getName,
      "graft_jpeg_dims"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_jpeg_dims(binary) takes 1 argument")
      graft.expressions.JpegDims(args(0))
    })

  /** graft_json_key_first(json, key) — O14's ordered search in SQL. */
  private val jsonKeyFunction = (
    FunctionIdentifier("graft_json_key_first"),
    new ExpressionInfo(classOf[graft.expressions.JsonKeyFirst].getName,
      "graft_json_key_first"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        "graft_json_key_first(json, key) takes 2 arguments")
      graft.expressions.JsonKeyFirst(args(0), args(1))
    })

  /** graft_simhash(array<string>) — the 64-bit digest in SQL. */
  private val simhashFunction = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[graft.expressions.SimHash64].getName,
      "graft_simhash"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_simhash(tokens) takes 1 argument")
      graft.expressions.SimHash64(args(0))
    })

  /** graft_mp4_meta(binary) → struct(timescale, duration, version). */
  private val mp4Function = (
    FunctionIdentifier("graft_mp4_meta"),
    new ExpressionInfo(classOf[graft.expressions.Mp4Meta].getName,
      "graft_mp4_meta"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_mp4_meta(binary) takes 1 argument")
      graft.expressions.Mp4Meta(args(0))
    })

  /** graft_hamming(hexA, hexB) — bit distance between hex digests,
    * the SimHash near-dup predicate in SQL.
    */
  private val hammingFunction = (
    FunctionIdentifier("graft_hamming"),
    new ExpressionInfo(classOf[graft.expressions.HammingHex].getName,
      "graft_hamming"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "graft_hamming(hexA, hexB) takes 2 arguments")
      graft.expressions.HammingHex(args(0), args(1))
    })

  /** graft_nfc(string) — Unicode NFC canonicalization in SQL. */
  private val nfcFunction = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[graft.expressions.NormalizeNfc].getName,
      "graft_nfc"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_nfc(s) takes 1 argument")
      graft.expressions.NormalizeNfc(args(0))
    })

  /** graft_exif_orientation(binary) — EXIF rotate/flip flag 1–8. */
  private val exifFunction = (
    FunctionIdentifier("graft_exif_orientation"),
    new ExpressionInfo(classOf[graft.expressions.ExifOrientation].getName,
      "graft_exif_orientation"),
    (args: Seq[Expression]) => {
      require(args.length == 1,
        "graft_exif_orientation(binary) takes 1 argument")
      graft.expressions.ExifOrientation(args(0))
    })

  /** graft_wordpiece(word, vocab) — greedy longest-match subword
    * segmentation against a foldable vocabulary, in SQL.
    */
  private val wordpieceFunction = (
    FunctionIdentifier("graft_wordpiece"),
    new ExpressionInfo(classOf[graft.expressions.WordpieceEncode].getName,
      "graft_wordpiece"),
    (args: Seq[Expression]) => {
      require(args.length == 2,
        "graft_wordpiece(word, vocab) takes 2 arguments")
      graft.expressions.WordpieceEncode(args(0), args(1))
    })

  /** graft_fix_mojibake(string) — repair UTF-8-as-Latin-1 misdecodes
    * in SQL.
    */
  private val mojibakeFunction = (
    FunctionIdentifier("graft_fix_mojibake"),
    new ExpressionInfo(classOf[graft.expressions.FixMojibake].getName,
      "graft_fix_mojibake"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_fix_mojibake(s) takes 1 argument")
      graft.expressions.FixMojibake(args(0))
    })

  /** graft_html_to_text(html) — markup → clean text (tag strip,
    * script/style drop, entity decode, whitespace collapse) in SQL.
    */
  private val htmlTextFunction = (
    FunctionIdentifier("graft_html_to_text"),
    new ExpressionInfo(classOf[graft.expressions.HtmlToText].getName,
      "graft_html_to_text"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_html_to_text(s) takes 1 argument")
      graft.expressions.HtmlToText(args(0))
    })

  /** graft_html_links(html) — href values of anchor tags, in document
    * order, entity-decoded, in SQL.
    */
  private val htmlLinksFunction = (
    FunctionIdentifier("graft_html_links"),
    new ExpressionInfo(classOf[graft.expressions.HtmlLinks].getName,
      "graft_html_links"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_html_links(s) takes 1 argument")
      graft.expressions.HtmlLinks(args(0))
    })

  /** graft_deflate_len(string) — DEFLATE-compressed byte length (the
    * compression-ratio quality signal) in SQL.
    */
  private val deflateFunction = (
    FunctionIdentifier("graft_deflate_len"),
    new ExpressionInfo(classOf[graft.expressions.DeflateLen].getName,
      "graft_deflate_len"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_deflate_len(s) takes 1 argument")
      graft.expressions.DeflateLen(args(0))
    })

  /** graft_html_refs(string) — typed (kind, url) outlinks with
    * base-href resolution (a/img/canonical), the crawl-frontier feed.
    */
  private val htmlRefsFunction = (
    FunctionIdentifier("graft_html_refs"),
    new ExpressionInfo(classOf[graft.expressions.HtmlRefs].getName,
      "graft_html_refs"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_html_refs(s) takes 1 argument")
      graft.expressions.HtmlRefs(args(0))
    })

  /** graft_html_tables(string) — (tbl,row,col,header,text) cells. */
  private val htmlTablesFunction = (
    FunctionIdentifier("graft_html_tables"),
    new ExpressionInfo(classOf[graft.expressions.HtmlTables].getName,
      "graft_html_tables"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_html_tables(s) takes 1 argument")
      graft.expressions.HtmlTables(args(0))
    })

  /** graft_html_meta(string) — (name, content) meta pairs. */
  private val htmlMetaFunction = (
    FunctionIdentifier("graft_html_meta"),
    new ExpressionInfo(classOf[graft.expressions.HtmlMeta].getName,
      "graft_html_meta"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_html_meta(s) takes 1 argument")
      graft.expressions.HtmlMeta(args(0))
    })

  /** graft_html_headings(string) — (level, text) document outline. */
  private val htmlHeadingsFunction = (
    FunctionIdentifier("graft_html_headings"),
    new ExpressionInfo(classOf[graft.expressions.HtmlHeadings].getName,
      "graft_html_headings"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_html_headings(s) takes 1 argument")
      graft.expressions.HtmlHeadings(args(0))
    })

  /** graft_html_lists(string) — (lst, item, depth, ordered, text). */
  private val htmlListsFunction = (
    FunctionIdentifier("graft_html_lists"),
    new ExpressionInfo(classOf[graft.expressions.HtmlLists].getName,
      "graft_html_lists"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_html_lists(s) takes 1 argument")
      graft.expressions.HtmlLists(args(0))
    })

  /** graft_html_sections(string) — (level, heading, body) sections. */
  private val htmlSectionsFunction = (
    FunctionIdentifier("graft_html_sections"),
    new ExpressionInfo(classOf[graft.expressions.HtmlSections].getName,
      "graft_html_sections"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_html_sections(s) takes 1 argument")
      graft.expressions.HtmlSections(args(0))
    })

  /** graft_char_counts(string) — per-document character histogram
    * (counts only, ascending code point), the single-pass feed of the
    * character-entropy signal.
    */
  private val charCountsFunction = (
    FunctionIdentifier("graft_char_counts"),
    new ExpressionInfo(classOf[graft.expressions.CharCounts].getName,
      "graft_char_counts"),
    (args: Seq[Expression]) => {
      require(args.length == 1, "graft_char_counts(s) takes 1 argument")
      graft.expressions.CharCounts(args(0))
    })

  private val all = Seq(dotFunction, cosineFunction, jpegFunction,
    jsonKeyFunction, simhashFunction, mp4Function, hammingFunction,
    nfcFunction, exifFunction, wordpieceFunction, mojibakeFunction,
    htmlTextFunction, htmlLinksFunction, htmlRefsFunction,
    htmlTablesFunction, htmlMetaFunction,
    htmlHeadingsFunction, htmlListsFunction, htmlSectionsFunction,
    deflateFunction, charCountsFunction)

  /** Session-scoped registration for an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, args => builder(args), "built-in")
    }
}
