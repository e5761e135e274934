package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.CurationLedger

/** Lifecycle laws for the persisted funnel ledger: append accumulates
  * run-keyed rows, the trend view lags per stage, and the stats gate
  * surfaces a double append instead of repairing it.
  */
class CurationLedgerSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: (String, Long)*) =
    rows.toDF("stage", "n")

  test("append accumulates runs; trend lags per stage; stats per run") {
    val root = Files.createTempDirectory("graft-ledger").toString
    val p = s"$root/funnel"
    CurationLedger.append(spark, p, "day-0",
      report("ingested" -> 100L, "kept" -> 80L))
    CurationLedger.append(spark, p, "day-1",
      report("ingested" -> 120L, "kept" -> 60L))
    CurationLedger.append(spark, p, "day-2",
      report("ingested" -> 110L, "kept" -> 90L))
    val led = CurationLedger.read(spark, p)
    assert(led.count() === 6L)
    // read == the union of the appended reports, run-keyed
    val got = led.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(
      ("day-0", "ingested", 100L), ("day-0", "kept", 80L),
      ("day-1", "ingested", 120L), ("day-1", "kept", 60L),
      ("day-2", "ingested", 110L), ("day-2", "kept", 90L)))
    // trend: per stage, delta against the previous run (null on day-0)
    val tr = CurationLedger.trend(led).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((Option(r.getAs[java.lang.Long]("prev_n")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("delta")).map(_.toLong))))
      .toMap
    assert(tr(("day-0", "kept")) === ((None, None)))
    assert(tr(("day-1", "kept")) === ((Some(80L), Some(-20L))))
    assert(tr(("day-2", "kept")) === ((Some(60L), Some(30L))))
    assert(tr(("day-2", "ingested")) === ((Some(120L), Some(-10L))))
    // a double append is VISIBLE in the health gate, not repaired
    CurationLedger.append(spark, p, "day-2", report("ingested" -> 110L))
    val st = CurationLedger.stats(CurationLedger.read(spark, p))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st === Map("day-0" -> 2L, "day-1" -> 2L, "day-2" -> 3L))
  }

  test("ledger waves sum to the whole-corpus funnel (conservation law)") {
    // every stage count is a plain count over its wave, and the three
    // waves partition the corpus — so the ledger's per-stage totals
    // must equal the (oracle-gated) full a_pipeline_curate funnel
    val dir = "/root/testdata/sf0.001"
    val led = SparkEntry.queries("a_funnel_ledger")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(led.map(_._1).distinct.sorted.toSeq ===
      Seq("day-0", "day-1", "day-2"))
    val sums = led.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val whole = SparkEntry.queries("a_pipeline_curate")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums === whole)
  }
}
