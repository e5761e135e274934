package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

import graft.operators.Paths

/** O10/O11/O12 path-rewrite edge cases (SURVEY.md §5 item 1). */
class PathsSpec extends SparkSpec {

  private def eval1(in: String, f: Column => Column): String = {
    import spark.implicits._
    Seq(in).toDF("p").select(f(col("p")).as("r")).collect()(0).getString(0)
  }

  test("O10 normalizeWithPrefix: already-prefixed kept, else prepended") {
    assert(eval1("raw/a.json", Paths.normalizeWithPrefix(_, "raw/")) === "raw/a.json")
    assert(eval1("a.json", Paths.normalizeWithPrefix(_, "raw/")) === "raw/a.json")
    assert(eval1("a.json", Paths.normalizeWithPrefix(_, "raw///")) === "raw/a.json")
    // python startswith is exact: "rawx" does not start with "raw/"
    assert(eval1("rawx/a.json", Paths.normalizeWithPrefix(_, "raw/")) === "raw/rawx/a.json")
  }

  test("O11 rewriteFirstOccurrence: first occurrence only") {
    assert(eval1("raw/raw/a.json", Paths.rewriteFirstOccurrence(_, "raw", "arch"))
      === "arch/raw/a.json")
    assert(eval1("x/raw/a.json", Paths.rewriteFirstOccurrence(_, "raw", "arch"))
      === "x/arch/a.json")
  }

  test("O11 fallback: prefix absent → basename under target") {
    assert(eval1("other/a.json", Paths.rewriteFirstOccurrence(_, "raw", "arch/"))
      === "arch/a.json")
    // src == tgt → replace is a no-op → same fallback (reference behavior)
    assert(eval1("raw/a.json", Paths.rewriteFirstOccurrence(_, "raw", "raw"))
      === "raw/a.json")
  }

  test("O12 rewriteRelocate: strip source, lstrip /, join target, collapse //") {
    assert(eval1("raw/q/a.json", Paths.rewriteRelocate(_, "raw/", "/files/sbt/quotes/"))
      === "/files/sbt/quotes/q/a.json")
    assert(eval1("/leading.json", Paths.rewriteRelocate(_, "raw/", "tgt"))
      === "tgt/leading.json")
    assert(eval1("raw//x.json", Paths.rewriteRelocate(_, "raw/", "tgt/"))
      === "tgt/x.json")
    // not under source path → full path appended (reference keeps it whole)
    assert(eval1("elsewhere/b.json", Paths.rewriteRelocate(_, "raw/", "tgt"))
      === "tgt/elsewhere/b.json")
  }

  test("basename / dirname") {
    assert(eval1("a/b/c.json", Paths.basename) === "c.json")
    assert(eval1("c.json", Paths.basename) === "c.json")
    assert(eval1("a/b/c.json", Paths.dirname) === "a/b")
    assert(eval1("c.json", Paths.dirname) === "")
  }
}
