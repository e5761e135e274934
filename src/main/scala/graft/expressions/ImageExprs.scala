package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StructField, StructType}

/** JPEG dimension probe as a native Catalyst expression: scans the
  * segment chain for a start-of-frame marker and reads the big-endian
  * height/width words — a real byte-level parser with no codec
  * library, so dimension filtering over a 100 TB image corpus runs
  * inside the scan stage. The marker walk needs a loop with early
  * exit, which column algebra can't express — a custom `Expression`
  * (eval-based, `CodegenFallback`) is the next-best tier per
  * SURVEY.md §7.3, and still avoids the UDF's serialization boundary.
  *
  * Returns struct(width int, height int); null for anything that is
  * not a well-formed JPEG prefix (wrong magic, truncated segment,
  * missing SOF).
  */
case class JpegDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jpeg_dims requires a binary argument, got " +
        child.dataType.simpleString)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_jpeg_dims"

  protected override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    def u(i: Int): Int = b(i) & 0xFF
    if (b.length < 4 || u(0) != 0xFF || u(1) != 0xD8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u(i) != 0xFF) return null // corrupt segment chain
      val marker = u(i + 1)
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
        i += 2 // standalone marker, no length word
      } else if (marker >= 0xC0 && marker <= 0xCF &&
                 marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        // SOFn: [len 2][precision 1][height 2][width 2]
        if (i + 8 >= b.length) return null
        val height = (u(i + 5) << 8) | u(i + 6)
        val width = (u(i + 7) << 8) | u(i + 8)
        return InternalRow(width, height)
      } else {
        val len = (u(i + 2) << 8) | u(i + 3)
        if (len < 2) return null
        i += 2 + len
      }
    }
    null
  }

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

/** EXIF orientation probe: walks the JPEG segment chain to APP1,
  * validates the `Exif\0\0` preamble, reads the TIFF header in EITHER
  * byte order (`II` little / `MM` big), and scans IFD0 for tag 0x0112
  * — the rotate/flip flag every camera writes and every training
  * pipeline must honor before decoding pixels. Same expression tier
  * as [[JpegDims]]: the walk needs loops with early exit, so an
  * eval-based native expression, never a UDF.
  *
  * Returns 1–8, or null for anything malformed (wrong magic,
  * truncated segment, bad TIFF endian/magic, missing tag,
  * out-of-range value) — every read is bounds-checked, so arbitrary
  * bytes can never throw.
  */
case class ExifOrientation(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_exif_orientation requires a binary argument, got " +
        child.dataType.simpleString)
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_exif_orientation"

  protected override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    def u(i: Int): Int = b(i) & 0xFF
    if (b.length < 4 || u(0) != 0xFF || u(1) != 0xD8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u(i) != 0xFF) return null
      val marker = u(i + 1)
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
        i += 2
      } else if (marker == 0xE1) {
        val len = (u(i + 2) << 8) | u(i + 3)
        if (len < 2 || i + 2 + len > b.length) return null
        val end = i + 2 + len // APP1 payload is [i+4, end)
        // "Exif\0\0" preamble
        if (i + 10 > end || u(i + 4) != 0x45 || u(i + 5) != 0x78 ||
          u(i + 6) != 0x69 || u(i + 7) != 0x66 ||
          u(i + 8) != 0 || u(i + 9) != 0) return null
        val t0 = i + 10 // TIFF header base
        if (t0 + 8 > end) return null
        val little =
          if (u(t0) == 0x49 && u(t0 + 1) == 0x49) true
          else if (u(t0) == 0x4D && u(t0 + 1) == 0x4D) false
          else return null
        def u16(p: Int): Int =
          if (little) u(p) | (u(p + 1) << 8) else (u(p) << 8) | u(p + 1)
        def u32(p: Int): Long =
          if (little)
            u(p) | (u(p + 1).toLong << 8) |
              (u(p + 2).toLong << 16) | (u(p + 3).toLong << 24)
          else
            (u(p).toLong << 24) | (u(p + 1).toLong << 16) |
              (u(p + 2) << 8) | u(p + 3)
        if (u16(t0 + 2) != 42) return null
        val ifdOff = u32(t0 + 4)
        if (ifdOff < 0 || t0 + ifdOff + 2 > end) return null
        val ifd = t0 + ifdOff.toInt
        val n = u16(ifd)
        var e = 0
        while (e < n) {
          val off = ifd + 2 + 12 * e
          if (off + 12 > end) return null
          if (u16(off) == 0x0112) {
            // type SHORT(3), count 1; value left-justified in the
            // 4-byte field per the declared byte order
            if (u16(off + 2) != 3 || u32(off + 4) != 1L) return null
            val v = u16(off + 8)
            return if (v >= 1 && v <= 8) v else null
          }
          e += 1
        }
        return null // APP1 present but no orientation tag
      } else {
        val len = (u(i + 2) << 8) | u(i + 3)
        if (len < 2) return null
        i += 2 + len
      }
    }
    null
  }

  override protected def withNewChildInternal(
      newChild: Expression): ExifOrientation = copy(child = newChild)
}

object ImageExprs {
  /** Column form: struct(width, height) or null. */
  def jpegDims(content: Column): Column =
    Bridge.column(JpegDims(Bridge.expression(content)))

  /** Column form: EXIF orientation 1–8, or null. */
  def exifOrientation(content: Column): Column =
    Bridge.column(ExifOrientation(Bridge.expression(content)))
}
