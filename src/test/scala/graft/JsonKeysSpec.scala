package graft

import graft.functions.JsonKeys._

/** O14 — all five reference branches (SURVEY.md §3.3; FIXTURES.md §2). */
class JsonKeysSpec extends SparkSpec {

  test("(a) top-level key") {
    assert(findKeyFirst("""{"SalesCompanyId": "12345", "QuoteId": "q"}""",
      "SalesCompanyId") === Some("12345"))
  }

  test("(b) nested in a dict value, numeric coerced like Python str()") {
    assert(findKeyFirst("""{"header": {"SalesCompanyId": 12345}, "lines": []}""",
      "SalesCompanyId") === Some("12345"))
  }

  test("(c) first element of a list value") {
    assert(findKeyFirst(
      """{"quotes": [{"SalesCompanyId": "12345"}, {"SalesCompanyId": "999"}]}""",
      "SalesCompanyId") === Some("12345"))
  }

  test("(d) key absent → None") {
    assert(findKeyFirst("""{"other": 1}""", "SalesCompanyId") === None)
  }

  test("(e) not JSON → None; tri-state handled by predicate") {
    assert(findKeyFirst("not json at all", "SalesCompanyId") === None)
    assert(!isValidJson("not json at all"))
    assert(isValidJson("""{"a":1}"""))
  }

  test("declaration order wins: dict/list children interleaved, first match") {
    // list child appears before the dict child → its first element wins
    val j = """{"a": [{"k": "L"}], "b": {"k": "D"}}"""
    assert(findKeyFirst(j, "k") === Some("L"))
    val j2 = """{"a": {"k": "D"}, "b": [{"k": "L"}]}"""
    assert(findKeyFirst(j2, "k") === Some("D"))
    // non-dict first list element does NOT match (reference checks value[0] only)
    val j3 = """{"a": [1, {"k": "X"}], "b": {"k": "D"}}"""
    assert(findKeyFirst(j3, "k") === Some("D"))
  }

  test("non-object root never matches") {
    assert(findKeyFirst("""["SalesCompanyId"]""", "SalesCompanyId") === None)
    assert(findKeyFirst(""""scalar"""", "SalesCompanyId") === None)
    assert(findKeyFirst("5", "SalesCompanyId") === None)
  }

  test("Python str() coercion: bool/null/float renderings") {
    assert(findKeyFirst("""{"k": true}""", "k") === Some("True"))
    assert(findKeyFirst("""{"k": false}""", "k") === Some("False"))
    assert(findKeyFirst("""{"k": null}""", "k") === Some("None"))
    assert(findKeyFirst("""{"k": 12.0}""", "k") === Some("12.0"))
    assert(findKeyFirst("""{"k": 12.5}""", "k") === Some("12.5"))
  }

  test("pyFloat matches CPython's positional/scientific bands") {
    import graft.functions.JsonKeys.pyFloat
    assert(pyFloat(0.0001) === "0.0001")       // Java: 1.0E-4
    assert(pyFloat(0.00001) === "1e-05")       // Java: 1.0E-5
    assert(pyFloat(1.23e-7) === "1.23e-07")
    assert(pyFloat(1e16) === "1e+16")          // Java: 1.0E16
    assert(pyFloat(1.5e16) === "1.5e+16")
    assert(pyFloat(1e15) === "1000000000000000.0")
    assert(pyFloat(1234.5) === "1234.5")
    assert(pyFloat(-0.25) === "-0.25")
    assert(pyFloat(100.0) === "100.0")
    assert(pyFloat(0.0) === "0.0")
  }

  test("contentPredicate tri-state on DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("""{"SalesCompanyId": "12"}""", true),   // match
      ("""{"SalesCompanyId": "99"}""", false),  // mismatch
      ("""{"x": 1}""", false),                  // key absent
      ("not json", false),                      // invalid w/ filter
      (null.asInstanceOf[String], false)
    ).toDF("json", "expected")
    val got = df.withColumn("got",
      contentPredicate(col("json"), "SalesCompanyId", Some("12")))
      .select("expected", "got").collect()
    got.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1)))
    // no filter → everything passes
    val all = df.withColumn("got",
      contentPredicate(col("json"), "SalesCompanyId", None))
      .select("got").collect()
    all.foreach(r => assert(r.getBoolean(0)))
  }
}
