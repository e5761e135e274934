package graft

import graft.operators.Keywords

/** Aho-Corasick automaton semantics: all-position (overlapping)
  * counts, suffix-pattern co-firing, fail-link correctness — checked
  * against a brute-force position scan (the oracle's exact algebra).
  */
class KeywordsSpec extends SparkSpec {

  private def brute(text: String, pats: Seq[String]): Seq[Long] =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }

  test("counts equal the brute-force position scan on edge-case texts") {
    val pats = Seq("a", "aa", "aaa", "ab", "ba", "aba", "bab")
    val texts = Seq("", "a", "aa", "aaaa", "abababab", "bbbb",
      "aabbaabb", "ababa")
    val ac = Keywords.Automaton(pats)
    texts.foreach { t =>
      assert(ac.countAll(t).toSeq === brute(t, pats), s"text '$t'")
    }
  }

  test("suffix patterns co-fire: 'scan' inside 'scan query'") {
    val ac = Keywords.Automaton(Seq("scan", "scan query", "query"))
    val c = ac.countAll("scan query scan")
    assert(c.toSeq === Seq(2L, 1L, 1L))
  }

  test("overlapping phrase occurrences are all counted") {
    val ac = Keywords.Automaton(Seq("table table"))
    // three 'table's contain TWO overlapping 'table table' windows
    assert(ac.countAll("table table table").toSeq === Seq(2L))
  }

  test("null text is zero everywhere; empty patterns rejected loudly") {
    val ac = Keywords.Automaton(Seq("x"))
    assert(ac.countAll(null).toSeq === Seq(0L))
    intercept[IllegalArgumentException] { Keywords.Automaton(Seq("")) }
    intercept[IllegalArgumentException] { Keywords.Automaton(Seq.empty) }
  }

  test("randomized parity with the brute force (fixed seed)") {
    val rnd = new scala.util.Random(42)
    val alpha = "ab "
    (1 to 50).foreach { _ =>
      val pats = (1 to 5).map(_ =>
        (1 to (1 + rnd.nextInt(4)))
          .map(_ => alpha(rnd.nextInt(2))).mkString).distinct
      val text = (1 to 60).map(_ => alpha(rnd.nextInt(3))).mkString
      val ac = Keywords.Automaton(pats)
      assert(ac.countAll(text).toSeq === brute(text, pats),
        s"pats=$pats text='$text'")
    }
  }

  test("MultiMatchCounts expression: plan-literal dictionary, null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "fast table scan query"), (2L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val out = df.select(col("id"),
        graft.expressions.TextExprs.multiMatch(col("text"),
          lit(Array("table", "scan query", "zzz"))).as("c"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Long](1)).map(_.toSeq)).toMap
    assert(out(1L) === Some(Seq(1L, 1L, 0L)))
    assert(out(2L) === None) // null text -> null counts (BinaryExpression)
    // non-foldable dictionary is a loud analysis error, not silence
    val err = intercept[Exception] {
      df.select(graft.expressions.TextExprs.multiMatch(
        col("text"), array(col("text")))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable") ||
      err.getMessage.contains("graft_multimatch"))
  }
}
