package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JsonKeys

/** O14's ordered JSON key search as a native expression: delegates to
  * the battle-tested [[graft.functions.JsonKeys.findKeyFirst]] (one
  * Jackson parse per row) but evaluates inside the operator, skipping
  * the Scala-UDF encoder round trip that re-materializes every row's
  * content string through a converter on both sides. `CodegenFallback`:
  * the parse is the cost, not the dispatch.
  */
case class JsonKeyFirst(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_json_key_first requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_key_first"

  protected override def nullSafeEval(json: Any, key: Any): Any =
    JsonKeys.findKeyFirst(json.toString, key.toString) match {
      case Some(v) => UTF8String.fromString(v)
      case None    => null
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonKeyFirst =
    copy(left = newLeft, right = newRight)
}

object JsonExprs {
  def jsonKeyFirst(json: Column, key: String): Column =
    Bridge.column(JsonKeyFirst(Bridge.expression(json),
      Bridge.expression(lit(key))))
}
