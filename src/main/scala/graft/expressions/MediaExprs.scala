package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** MP4 / ISO-BMFF movie-header probe as a native Catalyst expression:
  * walks the top-level box chain to `moov`, then its children to
  * `mvhd`, and reads timescale/duration for version 0 (32-bit) and
  * version 1 (64-bit) headers — real container parsing with no codec
  * library, so duration filtering over a 100 TB video corpus runs
  * inside the scan stage (cf. `JpegDims` for the tier rationale: the
  * box walk needs a loop, so an eval-based `Expression` with
  * `CodegenFallback` is the right rung below column algebra).
  *
  * Returns struct(timescale int, duration long, version int); null for
  * anything that is not a well-formed ISO-BMFF prefix (no moov/mvhd,
  * truncated box, unknown mvhd version, 64-bit `largesize` boxes).
  */
case class Mp4Meta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_mp4_meta requires a binary argument, got " +
        child.dataType.simpleString)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("timescale", IntegerType),
    StructField("duration", LongType),
    StructField("version", IntegerType)))

  override def nullable: Boolean = true

  override def prettyName: String = "graft_mp4_meta"

  protected override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    def u(i: Long): Int = b(i.toInt) & 0xFF
    def u32(i: Long): Long =
      (u(i).toLong << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def u64(i: Long): Long =
      (0 until 8).foldLeft(0L)((acc, k) => (acc << 8) | u(i + k))
    def boxType(i: Long): String =
      new String(b, i.toInt + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    var i = 0L
    while (i + 8 <= b.length) {
      val size = u32(i)
      if (size < 8) return null // size 0 (to-EOF) and 1 (largesize) unsupported
      if (boxType(i) == "moov") {
        val end = math.min(i + size, b.length.toLong)
        var j = i + 8
        while (j + 8 <= end) {
          val csize = u32(j)
          if (csize < 8) return null
          if (boxType(j) == "mvhd") {
            // field reads must stay inside the DECLARED extents (the
            // mvhd's own csize and the moov's end), not just the
            // buffer: a truncated mvhd followed by more data would
            // otherwise "parse" the next box's bytes as timescale /
            // duration instead of classifying as malformed
            if (j + 9 > b.length || 9 > csize || j + 9 > end)
              return null
            u(j + 8) match {
              case 0 => // [ver 1][flags 3][ctime 4][mtime 4][timescale 4][duration 4]
                if (j + 28 > b.length || 28 > csize || j + 28 > end)
                  return null
                return InternalRow(u32(j + 20).toInt, u32(j + 24), 0)
              case 1 => // [ver 1][flags 3][ctime 8][mtime 8][timescale 4][duration 8]
                if (j + 40 > b.length || 40 > csize || j + 40 > end)
                  return null
                return InternalRow(u32(j + 28).toInt, u64(j + 32), 1)
              case _ => return null
            }
          }
          j += csize
        }
        return null // moov without mvhd
      }
      i += size
    }
    null
  }

  override protected def withNewChildInternal(newChild: Expression): Mp4Meta =
    copy(child = newChild)
}

object MediaExprs {
  /** Column form: struct(timescale, duration, version) or null. */
  def mp4Meta(content: Column): Column =
    Bridge.column(Mp4Meta(Bridge.expression(content)))
}
