package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Paths

/** Property-based laws from SURVEY.md §5 (raw ScalaCheck generators,
  * fixed seeds for reproducibility): prefix idempotence of the path
  * rewrites and the semi ∪ anti partition law.
  */
class PropertySpec extends SparkSpec {

  private val seg = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val relPath = Gen.nonEmptyListOf(seg).map(_.take(4).mkString("/"))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("O10 is idempotent: normalize(normalize(p)) == normalize(p)") {
    import spark.implicits._
    (1L to 10L).foreach { s =>
      val paths = sample(Gen.listOfN(20, relPath), s)
      val df = paths.toDF("p")
      val once = df.select(Paths.normalizeWithPrefix(col("p"), "raw/").as("p"))
      val twice = once.select(Paths.normalizeWithPrefix(col("p"), "raw/").as("p"))
      assert(once.collect().map(_.getString(0)).toSeq ===
        twice.collect().map(_.getString(0)).toSeq)
    }
  }

  test("O12 output always lives under the target prefix, no double slash") {
    import spark.implicits._
    (1L to 10L).foreach { s =>
      val paths = sample(Gen.listOfN(20, relPath), 100 + s)
      val out = paths.toDF("p")
        .select(Paths.rewriteRelocate(col("p"), "raw/", "/tgt/").as("p"))
        .collect().map(_.getString(0))
      assert(out.forall(_.startsWith("/tgt/")))
      assert(out.forall(!_.contains("//")))
    }
  }

  test("partition law: semi ∪ anti == manifest (disjoint)") {
    import spark.implicits._
    (1L to 10L).foreach { s =>
      val manifest = sample(Gen.listOfN(30, Gen.chooseNum(0L, 50L)), 200 + s).distinct
      val listing  = sample(Gen.listOfN(30, Gen.chooseNum(0L, 50L)), 300 + s).distinct
      val m = manifest.toDF("k")
      val l = listing.toDF("k")
      val semi = m.join(l, Seq("k"), "left_semi").collect().map(_.getLong(0)).toSet
      val anti = m.join(l, Seq("k"), "left_anti").collect().map(_.getLong(0)).toSet
      assert((semi intersect anti).isEmpty)
      assert((semi union anti) === manifest.toSet)
    }
  }
}
