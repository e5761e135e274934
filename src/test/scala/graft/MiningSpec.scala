package graft

import org.apache.spark.sql.functions._

import graft.operators.Mining

/** Hand-checked fixtures for the pattern-mining operators. */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("skipgramPairs: window offsets, directionality, empty-token drop") {
    val docs = Seq("a b c", "x", "", "p  q").toDF("text")
    val got = Mining
      .skipgramPairs(docs, split(col("text"), " "), window = 2)
      .as[(String, String)].collect().sorted.toSeq
    // "a b c" w=2: (a,b),(b,c) at off 1; (a,c) at off 2.
    // "x": no pair. "": split -> [""] -> filtered.
    // "p  q": tokens [p, "", q]; (p,"") and ("",q) drop, (p,q) at off 2 kept.
    assert(got == Seq(("a", "b"), ("a", "c"), ("b", "c"), ("p", "q")))
  }

  test("skipgramPairs: rejects window < 1") {
    val docs = Seq("a b").toDF("text")
    intercept[IllegalArgumentException] {
      Mining.skipgramPairs(docs, split(col("text"), " "), window = 0)
    }
  }

  test("pmi: hand values") {
    // N = 4, cx(x) = 4, cy(y) = cy(z) = 2:
    //   pmi(x,y) = ln(2*4 / (4*2)) = 0; same for (x,z).
    val pc = Seq(("x", "y", 2L), ("x", "z", 2L)).toDF("w1", "w2", "c")
    val got = Mining.pmi(pc).select("w1", "w2", "pmi")
      .as[(String, String, Double)].collect()
      .map { case (a, b, p) => (a, b) -> p }.toMap
    assert(got(("x", "y")) == 0.0 && got(("x", "z")) == 0.0)
  }

  test("associationRules: support/confidence/lift hand values + apriori prune") {
    // baskets: 1:{A,B}, 2:{A,B}, 3:{A,C}; minSupport=2 prunes C (1 basket).
    // A→B: support 2, confidence 2/3, lift 2*3/(3*2) = 1.0
    // B→A: support 2, confidence 1.0, lift 1.0
    val b = Seq((1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C"),
      (3, "C")) // duplicate row: internal dedup must absorb it
      .toDF("bk", "item")
    val got = Mining.associationRules(b, col("bk"), col("item"), minSupport = 2)
      .as[(String, String, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got.keySet == Set(("A", "B"), ("B", "A")))
    assert(got(("A", "B")) == ((2L, 0.666667, 1.0)))
    assert(got(("B", "A")) == ((2L, 1.0, 1.0)))
  }

  test("associationRules: rejects minSupport < 1") {
    val b = Seq((1, "A")).toDF("bk", "item")
    intercept[IllegalArgumentException] {
      Mining.associationRules(b, col("bk"), col("item"), minSupport = 0)
    }
  }
}
