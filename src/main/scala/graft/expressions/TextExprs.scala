package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Dedup

/** 64-bit SimHash digest as a native expression: same algorithm as
  * [[graft.operators.Dedup.simhashHex]] (the oracle replicates it in
  * SQL), evaluated in-operator over the token ArrayData — no UDF
  * encoder materialization for the one per-document digest pass that
  * runs over the ENTIRE corpus at 100 TB. CodegenFallback: the md5 per
  * token dominates, not the dispatch.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  protected override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val tokens = new Array[String](n)
    var i = 0
    while (i < n) {
      tokens(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      i += 1
    }
    UTF8String.fromString(
      Dedup.simhashHex(tokens.toSeq.filter(_ != null)))
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Hamming distance between two equal-length hex digests — the
  * verification step on candidate pairs, in-operator.
  */
case class HammingHex(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hamming requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_hamming"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    Dedup.hammingHex(a.toString, b.toString)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingHex =
    copy(left = newLeft, right = newRight)
}

/** Unicode NFC normalization as a native expression with REAL codegen
  * — the canonicalization pass a crawl corpus needs before any
  * hash-based dedup (a decomposed "cafe&#x301;" and a precomposed
  * "café" md5 differently but are the same text). The generated code
  * calls only JDK classes (java.text.Normalizer), stays inside
  * whole-stage codegen, and skips allocation entirely on
  * already-normalized input via the isNormalized fast path — on a
  * mostly-ASCII corpus the pass runs at scan speed.
  */
case class NormalizeNfc(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc requires string, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  protected override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("nfcStr")
      s"""
         |String $s = $c.toString();
         |${ev.value} =
         |  java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize(
         |          $s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NormalizeNfc = copy(child = newChild)
}

/** Multi-pattern occurrence counting as a native expression: the
  * Aho-Corasick automaton ([[graft.operators.Keywords.Automaton]]) is
  * compiled LAZILY once per executor from the foldable pattern-array
  * literal baked into the plan, then every row's text streams through
  * it in one pass — K dictionary terms for the cost of one scan, no
  * UDF encoder round trip, no per-pattern LIKE cascade. Returns the
  * per-pattern counts aligned with the literal's order (overlapping
  * occurrences included — the count is a pure position-scan function
  * of (text, pattern), which is what makes it SQL-replayable).
  * CodegenFallback: the automaton walk dominates, not dispatch.
  */
case class MultiMatchCounts(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_multimatch requires a FOLDABLE pattern array (the " +
            "automaton is plan-compiled; per-row dictionaries need a join)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_multimatch requires (string, array<string>), got $other")
    }
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_multimatch"

  @transient private lazy val automaton: graft.operators.Keywords.Automaton = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val pats = (0 until arr.numElements())
      .map(i => arr.getUTF8String(i).toString)
    graft.operators.Keywords.Automaton(pats)
  }

  protected override def nullSafeEval(text: Any, pats: Any): Any = {
    val counts = automaton.countAll(text.toString)
    ArrayData.toArrayData(counts)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MultiMatchCounts =
    copy(left = newLeft, right = newRight)
}

/** Mojibake repair for crawl corpora: text that was UTF-8 bytes
  * mistakenly decoded as Latin-1 upstream ("café" arriving as
  * "cafÃ©") is re-encoded to its Latin-1 bytes and STRICTLY re-decoded
  * as UTF-8; the repair applies only when every char fits in Latin-1
  * (chars above U+00FF cannot have come from a Latin-1 decode), the
  * reinterpretation is valid UTF-8, and it actually changes the
  * string — anything else passes through untouched, so the transform
  * is idempotent and safe on already-clean text (pure-ASCII rows take
  * a scan-only fast path). CodegenFallback: the charset round trip
  * dominates, not dispatch.
  */
case class FixMojibake(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_fix_mojibake requires string, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    var i = 0
    var hasHigh = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c > 0xFF) return input // not a Latin-1 misdecode — leave it
      if (c > 0x7F) hasHigh = true
      i += 1
    }
    if (!hasHigh) return input // pure ASCII — nothing to repair
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      val repaired = dec.decode(java.nio.ByteBuffer.wrap(
        s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))).toString
      if (repaired != s) UTF8String.fromString(repaired) else input
    } catch {
      case _: java.nio.charset.CharacterCodingException => input
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): FixMojibake = copy(child = newChild)
}

/** Greedy longest-match-first subword segmentation against a FOLDABLE
  * vocabulary (the WordPiece/BERT-tokenizer encode convention): at
  * each position the longest vocabulary piece prefixing the remaining
  * word is consumed; where nothing matches, the single character
  * passes through (so coverage stays measurable instead of collapsing
  * to an opaque UNK). Returns the piece array. The vocabulary is
  * plan-compiled once into a hash set + max piece length (foldable
  * literal — per-row vocabularies need a join), making the scan
  * O(len · maxPieceLen) per word with no per-row setup. The greedy
  * walk is deterministic string algebra, so the DuckDB oracle replays
  * it with a recursive CTE. CodegenFallback: the match loop dominates,
  * not dispatch.
  */
case class WordpieceEncode(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "graft_wordpiece requires a FOLDABLE vocabulary array (the " +
            "lookup table is plan-compiled; per-row vocabs need a join)")
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_wordpiece requires (string, array<string>), got $other")
    }
  }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_wordpiece"

  @transient private lazy val table: (java.util.HashSet[String], Int) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val set = new java.util.HashSet[String]()
    var mx = 1
    (0 until arr.numElements()).foreach { i =>
      val p = arr.getUTF8String(i).toString
      if (p.nonEmpty) { set.add(p); mx = math.max(mx, p.length) }
    }
    (set, mx)
  }
  private def vocab = table._1
  private def maxPiece = table._2

  protected override def nullSafeEval(word: Any, v: Any): Any = {
    val w = word.toString
    val out = scala.collection.mutable.ArrayBuffer[UTF8String]()
    var pos = 0
    while (pos < w.length) {
      var l = math.min(maxPiece, w.length - pos)
      var hit = 0
      while (l >= 2 && hit == 0) {
        if (vocab.contains(w.substring(pos, pos + l))) hit = l else l -= 1
      }
      // pass-through consumes a full CODE POINT, never half a
      // surrogate pair — a lone surrogate would encode as '?' and the
      // piece stream would stop round-tripping the word
      if (hit == 0) hit = Character.charCount(w.codePointAt(pos))
      out += UTF8String.fromString(w.substring(pos, pos + hit))
      pos += hit
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordpieceEncode =
    copy(left = newLeft, right = newRight)
}

/** DEFLATE-compressed length of a string's UTF-8 bytes (zlib level 6,
  * default strategy) — the compression-ratio quality signal (C4/Dolma
  * family): highly compressible text is repetitive boilerplate, nearly
  * incompressible text is noise/binary-in-text; natural prose sits in
  * a band between. Deterministic (pure-JDK Deflater, fixed level, one
  * whole-input pass). Library-only: no SQL engine exposes zlib, so the
  * gate is spec-level, not an oracle row. CodegenFallback: the
  * compressor dominates, not dispatch.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_len requires string, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_deflate_len"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // per-row `new Deflater` means native zlib alloc/free churn on
    // every document; a thread-local compressor reset between rows is
    // the per-task-lifetime shape this per-row quality signal needs
    val d = DeflateLen.localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(
      newChild: Expression): DeflateLen = copy(child = newChild)
}

object DeflateLen {
  /** One zlib stream per executor thread, reset between rows, and
    * `end()`ed DETERMINISTICALLY when the owning task completes (a
    * task-completion listener registered at first use) — a Deflater's
    * native window is ~256 KiB, and a large recycled executor thread
    * pool would otherwise accumulate one per thread for the JVM
    * lifetime with only the cleaner to reclaim it. Driver-side eval
    * (no TaskContext — tests, constant folding) keeps the
    * thread-lifetime stream: a bounded handful of threads.
    */
  private val localDeflater: ThreadLocal[java.util.zip.Deflater] =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater = {
        val d = new java.util.zip.Deflater(6)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          d.end()
          localDeflater.remove()
        }
        d
      }
    }
}

/** Per-document character histogram: the multiset of code-point counts
  * (values only, ascending code-point order — deterministic under any
  * partitioning), one automaton-style walk per row, no per-character
  * row materialization. This is the single-pass plan behind the
  * character-entropy gibberish signal: the old shape exploded one row
  * PER CHARACTER and shuffled (doc, char) pairs into a groupBy; the
  * histogram is a per-row fact and never needed a shuffle at all. The
  * entropy fold stays in column algebra downstream (`aggregate` over
  * this array), so the oracle's arithmetic is untouched. ASCII counts
  * in a flat 128-slot array (the hot path of a web corpus); anything
  * higher overflows into a sorted map. CodegenFallback: the walk
  * dominates, not dispatch.
  */
case class CharCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_char_counts requires string, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_counts"

  protected override def nullSafeEval(input: Any): Any = {
    val s = input.toString
    val ascii = new Array[Long](128)
    var high: java.util.TreeMap[Integer, Long] = null
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (high == null) high = new java.util.TreeMap[Integer, Long]()
        high.merge(cp, 1L, (a, b) => a + b)
      }
      i += Character.charCount(cp)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var c = 0
    while (c < 128) { if (ascii(c) > 0L) out += ascii(c); c += 1 }
    if (high != null) high.values.forEach(v => out += v)
    ArrayData.toArrayData(out.toArray)
  }

  override protected def withNewChildInternal(
      newChild: Expression): CharCounts = copy(child = newChild)
}

/** Binary payload → text, transparently inflating gzip: bytes opening
  * with the gzip magic (0x1f 0x8b) stream through a pure-JDK
  * GZIPInputStream (null on a corrupt stream — a truncated fetch must
  * not crash the scan, it must be SELECTABLE), anything else decodes
  * as UTF-8. The production read path for compressed web artifacts
  * fetched as opaque blobs (sitemap.xml.gz is the canonical case:
  * sitemaps.org/protocol.html allows gzip leaf sitemaps); output is
  * bounded to `maxBytes` decompressed (gzip-bomb guard — the sitemap
  * protocol itself caps files at 50 MiB uncompressed, which is the
  * default here). Deterministic one-pass decode; CodegenFallback: the
  * inflater dominates, not dispatch. Library + spec gated (no SQL
  * engine exposes gzip).
  */
case class GunzipText(child: Expression,
                      maxBytes: Int = GunzipText.DefaultMaxBytes)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_gunzip_text requires binary, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gunzip_text"

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length >= 2 &&
        (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      try {
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        var total = 0
        while (n > 0 && total <= maxBytes) {
          out.write(buf, 0, n); total += n; n = in.read(buf)
        }
        in.close()
        if (total > maxBytes) null // bomb guard: over-cap is null, loud
        else UTF8String.fromBytes(out.toByteArray)
      } catch { case _: java.io.IOException => null }
    } else UTF8String.fromBytes(bytes)
  }

  override protected def withNewChildInternal(
      newChild: Expression): GunzipText = copy(child = newChild)
}

object GunzipText {
  /** sitemaps.org's own uncompressed-size cap. */
  val DefaultMaxBytes: Int = 50 * 1024 * 1024
}

object TextExprs {
  def simhash(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def gunzipText(bytes: Column): Column =
    Bridge.column(GunzipText(Bridge.expression(bytes)))

  def deflateLen(s: Column): Column =
    Bridge.column(DeflateLen(Bridge.expression(s)))

  def charCounts(s: Column): Column =
    Bridge.column(CharCounts(Bridge.expression(s)))

  def wordpiece(word: Column, vocab: Column): Column =
    Bridge.column(WordpieceEncode(
      Bridge.expression(word), Bridge.expression(vocab)))

  def fixMojibake(s: Column): Column =
    Bridge.column(FixMojibake(Bridge.expression(s)))

  def hamming(a: Column, b: Column): Column =
    Bridge.column(HammingHex(Bridge.expression(a), Bridge.expression(b)))

  def nfc(s: Column): Column =
    Bridge.column(NormalizeNfc(Bridge.expression(s)))

  def multiMatch(text: Column, patterns: Column): Column =
    Bridge.column(MultiMatchCounts(
      Bridge.expression(text), Bridge.expression(patterns)))
}
