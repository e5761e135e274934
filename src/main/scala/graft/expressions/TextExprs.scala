package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

object TextExprs {
  def simhash(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def hamming(a: Column, b: Column): Column =
    Bridge.column(HammingHex(Bridge.expression(a), Bridge.expression(b)))

  def nfc(s: Column): Column =
    Bridge.column(NormalizeNfc(Bridge.expression(s)))
}
