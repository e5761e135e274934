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

object ImageExprs {
  /** Column form: struct(width, height) or null. */
  def jpegDims(content: Column): Column =
    Bridge.column(JpegDims(Bridge.expression(content)))
}
