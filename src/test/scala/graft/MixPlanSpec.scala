package graft

import graft.operators.MixPlan

/** Laws for the water-filling mix planner: exact budget conservation,
  * cap respect, max-min fairness, determinism of the leftover
  * distribution, and the degenerate edges.
  */
class MixPlanSpec extends SparkSpec {
  import spark.implicits._

  private def plan(avail: Seq[(String, Long)], budget: Long, rep: Int) =
    MixPlan.allocate(avail.toDF("source", "available"), budget, rep)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap

  test("conservation, caps, max-min, deterministic leftovers") {
    val avail = Seq("a" -> 100L, "b" -> 1000L, "c" -> 1000L, "d" -> 40L)
    val got = plan(avail, budget = 1003L, rep = 2)
    // caps respected everywhere; total == budget (budget < Σcap)
    got.foreach { case (s, (a, c, al, _, _)) =>
      assert(c === a * 2 && al <= c, s) }
    assert(got.values.map(_._3).sum === 1003L)
    // small sources saturate (cap 80, 200 both under the level),
    // the two big ones split the rest: 723 = 362 + 361, +1 to the
    // FIRST in (cap, source) order — b before c
    assert(got("d") === ((40L, 80L, 80L, 2000000L, true)))
    assert(got("a") === ((100L, 200L, 200L, 2000000L, true)))
    assert(got("b")._3 === 362L && got("c")._3 === 361L)
    assert(!got("b")._5 && !got("c")._5)
    // repetition_ppm is exact: 362e6 div 1000
    assert(got("b")._4 === 362000L)
  }

  test("edges: budget exceeds supply; budget zero; single source") {
    // budget >= Σcap: everyone saturates, total == Σcap (unspent is
    // the caller's signal to go find more data)
    val over = plan(Seq("a" -> 10L, "b" -> 20L), budget = 1000L, rep = 3)
    assert(over.values.forall(_._5) &&
      over.values.map(_._3).sum === 90L)
    // zero budget: all zero, nothing saturated (no cap reached)
    val zero = plan(Seq("a" -> 10L, "b" -> 20L), budget = 0L, rep = 2)
    assert(zero.values.forall(v => v._3 === 0L && !v._5))
    // single source: min(cap, budget)
    assert(plan(Seq("a" -> 10L), 15L, 2)("a")._3 === 15L)
    assert(plan(Seq("a" -> 10L), 99L, 2)("a")._3 === 20L)
    intercept[IllegalArgumentException] {
      MixPlan.allocate(Seq(("a", 1L)).toDF("source", "available"), -1L, 2)
    }
    intercept[IllegalArgumentException] {
      MixPlan.allocate(Seq(("a", 1L)).toDF("source", "available"), 1L, 0)
    }
  }

  test("availability guard: null/zero/negative supply and cap overflow fail loudly") {
    import spark.implicits._
    // zero and negative availability must not poison the water-fill
    intercept[IllegalArgumentException] {
      MixPlan.allocate(Seq(("a", 0L), ("b", 5L))
        .toDF("source", "available"), 10L, 2).collect()
    }
    intercept[IllegalArgumentException] {
      MixPlan.allocate(Seq(("a", -3L), ("b", 5L))
        .toDF("source", "available"), 10L, 2).collect()
    }
    // a null availability (cap would sort first and null the prefix)
    intercept[IllegalArgumentException] {
      MixPlan.allocate(
        Seq(("a", Some(4L)), ("b", Option.empty[Long]))
          .toDF("source", "available"), 10L, 2).collect()
    }
    // available * maxRep overflowing Long must be rejected, not wrapped
    intercept[IllegalArgumentException] {
      MixPlan.allocate(Seq(("a", Long.MaxValue / 2 + 1))
        .toDF("source", "available"), 10L, 2).collect()
    }
    // boundary: max available exactly at the overflow edge still works
    val edge = MixPlan.allocate(Seq(("a", Long.MaxValue / 2))
      .toDF("source", "available"), 10L, 2).collect()
    assert(edge.length === 1 && edge(0).getAs[Long]("alloc") === 10L)
  }

  test("empty avail frame yields an empty plan, not an NPE") {
    import spark.implicits._
    // sum() over zero rows is null; the guard must coalesce it to 0
    // and fall through to the empty-plan path (an empty corpus is a
    // legal input for mixEpochSchedule-style callers)
    val out = MixPlan.allocate(
      Seq.empty[(String, Long)].toDF("source", "available"), 100L, 3)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("source", "available", "cap",
      "alloc", "repetition_ppm", "saturated"))
  }

  test("materializeEpochs: full epochs + prefix remainder, per-epoch order") {
    import spark.implicits._
    // a: 3 docs × 10 tokens (available 30); b: 2 docs × 10 (available
    // 20). budget 75, maxRep 3 → caps 90/60, nothing saturates,
    // base = 37 (+1 leftover to b, the cap-ascending first):
    // a alloc 37 → 1 full epoch, rem 7 → no doc fits the partial;
    // b alloc 38 → 1 full epoch, rem 18 → exactly one extra doc
    val docs = Seq(
      ("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L),
      ("b", 4L, 10L), ("b", 5L, 10L))
      .toDF("source", "doc_id", "n_tokens")
    val plan = MixPlan.allocate(
      Seq(("a", 30L), ("b", 20L)).toDF("source", "available"),
      budget = 75L, maxRep = 3)
    val got = MixPlan.materializeEpochs(docs, plan).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val byEpoch = got.groupBy(t => (t._1, t._3)).view
      .mapValues(_.length).toMap
    assert(byEpoch === Map(("a", 0L) -> 3, ("b", 0L) -> 2,
      ("b", 1L) -> 1))
    // ord is a contiguous 1..n rank within each (source, epoch)
    got.groupBy(t => (t._1, t._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to rows.length).map(_.toLong))
    }
    // token conservation: materialized tokens never exceed the alloc,
    // and adding the first excluded doc would overshoot
    val tok = docs.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val allocs = plan.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("alloc")).toMap
    Seq("a", "b").foreach { s =>
      val used = got.filter(_._1 == s).map(t => tok((s, t._2))).sum
      assert(used <= allocs(s), s"source $s overshoots")
      assert(used + 10L > allocs(s), s"source $s leaves a full doc unspent")
    }
    // saturated sources materialize exactly maxRep epochs of every doc
    val sat = MixPlan.materializeEpochs(docs, MixPlan.allocate(
      Seq(("a", 30L), ("b", 20L)).toDF("source", "available"),
      budget = 1000L, maxRep = 3)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(sat.groupBy(t => (t._1, t._2)).values
      .forall(_.map(_._3).sorted.toSeq === Seq(0L, 1L, 2L)))
  }

  test("water-filling optimality: no unsaturated source above the level+1") {
    // max-min: every unsaturated allocation is within 1 token of every
    // other unsaturated allocation (the integer water level), and no
    // saturated cap exceeds any unsaturated allocation + 1
    val avail = (1 to 9).map(i => s"s$i" -> (i * i * 7L))
    val got = plan(avail, budget = 600L, rep = 2)
    assert(got.values.map(_._3).sum === 600L)
    val unsat = got.values.filter(!_._5).map(_._3)
    assert(unsat.nonEmpty && unsat.max - unsat.min <= 1L)
    val satCaps = got.values.filter(_._5).map(_._2)
    satCaps.foreach(c => assert(c <= unsat.max))
  }
}
