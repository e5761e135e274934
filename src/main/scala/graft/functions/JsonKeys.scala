package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** O14 — schema-agnostic JSON key search (SURVEY.md §2.2, §3.3).
  *
  * Reproduces the reference's `check_file_content` search order
  * (app/main.py:64-81): (a) key at the top level of a JSON object;
  * (b) walking the object's entries in declaration order, the first
  * entry whose value is an object containing the key; (c) interleaved
  * in the same walk, the first entry whose value is a non-empty array
  * whose FIRST element is an object containing the key. First match
  * wins; a non-object root never matches.
  *
  * Values are coerced to strings Python-`str()`-style
  * (app/main.py:70,76,81,89): numbers keep integer-vs-float rendering
  * ("12" / "12.0"), booleans become "True"/"False", null becomes
  * "None". (Python renders dict/list values via repr — we render JSON
  * text; only relevant if the key maps to a container, which the
  * reference would then string-compare and reject anyway.)
  *
  * Implemented as a Scala UDF over Jackson (ships with Spark; object
  * nodes preserve field order). This is the single custom scalar
  * function the parity surface needs — everything else is built-in
  * (SURVEY.md §7.3).
  */
object JsonKeys {

  @transient private lazy val mapper = new ObjectMapper()

  private def pyStr(n: JsonNode): String =
    if (n == null || n.isNull) "None"
    else if (n.isBoolean) { if (n.asBoolean) "True" else "False" }
    else if (n.isTextual) n.asText
    else if (n.isIntegralNumber) n.bigIntegerValue.toString
    else if (n.isFloatingPointNumber) pyFloat(n.asDouble)
    else n.toString

  /** Python `str(float)` rendering: positional while the decimal
    * exponent is in [-4, 16), else scientific with a lowercase `e`,
    * explicit sign, and ≥2 exponent digits — Java's bands and `E`
    * notation differ, which would break string-compared parity.
    * (Digits come from Java's shortest round-trip repr; on JDK 17 that
    * can very rarely carry an extra digit vs CPython's shortest.)
    */
  private[graft] def pyFloat(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinity) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return if (1 / d < 0) "-0.0" else "0.0"
    val sign = if (d < 0) "-" else ""
    val s = java.lang.Double.toString(math.abs(d))
    val (mant, e) = s.split('E') match {
      case Array(m)     => (m, 0)
      case Array(m, ex) => (m, ex.toInt)
    }
    val intLen = { val i = mant.indexOf('.'); if (i < 0) mant.length else i }
    val raw = mant.replace(".", "")
    val lead = raw.indexWhere(_ != '0') max 0
    val digits0 = raw.drop(lead).reverse.dropWhile(_ == '0').reverse
    val digits = if (digits0.isEmpty) "0" else digits0
    val e10 = intLen + e - lead // value = 0.digits × 10^e10
    val exp10 = e10 - 1         // exponent of the leading digit
    if (exp10 >= -4 && exp10 < 16) {
      if (e10 <= 0) sign + "0." + ("0" * -e10) + digits
      else if (e10 >= digits.length)
        sign + digits + ("0" * (e10 - digits.length)) + ".0"
      else sign + digits.take(e10) + "." + digits.drop(e10)
    } else {
      val m =
        if (digits.length == 1) digits else s"${digits.head}.${digits.tail}"
      val es = if (exp10 < 0) "-" else "+"
      sign + m + "e" + es + f"${math.abs(exp10)}%02d"
    }
  }

  /** True iff the string parses as JSON at all (tri-state support,
    * app/main.py:97-102).
    */
  def isValidJson(json: String): Boolean =
    json != null && (try { mapper.readTree(json); true }
    catch { case _: Exception => false })

  /** The ordered key search. None ⇔ invalid JSON, non-object root, or
    * key absent at all three probe locations.
    */
  def findKeyFirst(json: String, key: String): Option[String] = {
    if (json == null || key == null) return None
    val root =
      try mapper.readTree(json)
      catch { case _: Exception => return None }
    if (root == null || !root.isObject) return None
    if (root.has(key)) return Some(pyStr(root.get(key)))
    val it = root.properties().iterator()
    while (it.hasNext) {
      val v = it.next().getValue
      if (v.isObject && v.has(key)) return Some(pyStr(v.get(key)))
      if (v.isArray && v.size() > 0 && v.get(0).isObject && v.get(0).has(key))
        return Some(pyStr(v.get(0).get(key)))
    }
    None
  }

  val findKeyFirstUdf: UserDefinedFunction =
    udf((json: String, key: String) => findKeyFirst(json, key))

  /** Column form: first value of `key` found by the ordered search, or
    * null. Runs as a native eval expression ([[graft.expressions
    * .JsonKeyFirst]]) — same `findKeyFirst` logic, minus the UDF's
    * encoder round trip on every row of the content scan.
    */
  def jsonKeyFirst(json: Column, key: String): Column =
    graft.expressions.JsonExprs.jsonKeyFirst(json, key)

  /** O14's tri-state predicate (app/main.py:64-102): with no filter every
    * file passes; with a filter, only valid-JSON objects whose located key
    * string-equals the target pass (invalid JSON / missing key ⇒ false).
    */
  def contentPredicate(json: Column, key: String, filter: Option[String]): Column =
    filter match {
      case None    => lit(true)
      case Some(f) => coalesce(jsonKeyFirst(json, key) === lit(f), lit(false))
    }
}
