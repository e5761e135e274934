package graft

import org.apache.spark.sql.functions._

import graft.operators.{Diff, Layout}

/** Table-maintenance operators: small-file compaction and snapshot
  * diff. */
class MaintenanceSpec extends SparkSpec {

  test("compact: many small files become targetFiles, data unchanged") {
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString
    try {
      // simulate a micro-batch sink's residue: 32 tiny files
      spark.range(0, 10000L).repartition(32)
        .write.mode("overwrite").parquet(out)
      def dataFiles(): Int = new java.io.File(out)
        .listFiles().count(_.getName.endsWith(".parquet"))
      assert(dataFiles() === 32)
      val before = spark.read.parquet(out)
        .agg(count(lit(1)), sum(col("id"))).head()
      val n = Layout.compact(spark, out, targetFiles = 4)
      assert(n === 4 && dataFiles() === 4)
      val after = spark.read.parquet(out)
        .agg(count(lit(1)), sum(col("id"))).head()
      assert(after === before)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("writeSharded: per-file row bound enforced, manifest sums to total") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_shard").toString + "/shards"
    try {
      val df = (1L to 1000L).map(i => (i, s"doc$i")).toDF("id", "text")
      val manifest = graft.operators.Layout.writeSharded(df, out, rowsPerShard = 128)
        .as[(String, Long)].collect()
      assert(manifest.map(_._2).sum === 1000L)
      assert(manifest.forall(_._2 <= 128), manifest.toSeq)
      assert(manifest.length >= 8) // ceil(1000/128)
      // round-trip intact
      assert(spark.read.parquet(out).count() === 1000L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(out).getParentFile)
    }
  }

  test("incremental HLL distinct: batched sketch merges track exact distinct") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString + "/state"
    try {
      // overlapping user sets across batches — counts do NOT add, only
      // the sketch union is correct
      val all = (1L to 6000L).map(i => (s"d${i % 3}", i % 400)).toDF("day", "uid")
      Seq(0L, 1L, 2L).foreach { b =>
        graft.operators.IncrementalAgg.updateDistinct(spark, dir,
          all.filter(col("uid") % 3 === b), Seq("day"), "uid")
      }
      val got = graft.operators.IncrementalAgg.readDistinct(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val want = all.groupBy("day").agg(countDistinct(col("uid")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.keySet === want.keySet)
      // lgK=12 HLL is exact at these cardinalities (dense mode far off)
      want.foreach { case (k, n) => assert(got(k) === n, s"$k: ${got(k)} vs $n") }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("incremental aggregation: N batch updates == one-shot aggregate") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString + "/state"
    try {
      val all = (1L to 3000L).map(i => (s"k${i % 7}", (i % 100) / 4.0)).toDF("k", "v")
      // three arrival batches with different boundaries
      graft.operators.IncrementalAgg.update(spark, dir,
        all.filter(col("v") < 10), Seq("k"), "v")
      graft.operators.IncrementalAgg.update(spark, dir,
        all.filter(col("v") >= 10 && col("v") < 20), Seq("k"), "v")
      graft.operators.IncrementalAgg.update(spark, dir,
        all.filter(col("v") >= 20), Seq("k"), "v")
      val got = graft.operators.IncrementalAgg.read(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2).doubleValue, r.getDouble(3))).toMap
      val want = all.groupBy("k").agg(count(lit(1)).as("cnt"),
          sum(col("v").cast("decimal(18,2)")).cast("double").as("s"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
      assert(got.size === want.size)
      want.foreach { case (k, (cnt, s)) =>
        val (gc, gs, gavg) = got(k)
        assert(gc === cnt && gs === s && gavg === s / cnt, k)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("incremental aggregation fed by a stream (foreachBatch) == batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_sincr").toString + "/state"
    try {
      val mem = MemoryStream[(String, Double)]
      mem.addData(("a", 1.5), ("b", 2.0), ("a", 3.25))
      mem.addData(("b", 4.0), ("c", 0.25))
      val q = mem.toDF().toDF("k", "v").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.operators.IncrementalAgg.update(spark, dir, batch, Seq("k"), "v")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
      val got = graft.operators.IncrementalAgg.read(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2).doubleValue)).toMap
      assert(got === Map("a" -> (2L, 4.75), "b" -> (2L, 6.0), "c" -> (1L, 0.25)))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("HLL distinct state fed by a stream (foreachBatch) tracks exact distinct") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = java.nio.file.Files.createTempDirectory("graft_shll").toString + "/state"
    try {
      val mem = MemoryStream[(String, Long)]
      mem.addData(("d1", 1L), ("d1", 2L), ("d2", 1L))
      mem.addData(("d1", 2L), ("d1", 3L), ("d2", 1L)) // overlaps batch 1
      val q = mem.toDF().toDF("day", "uid").writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          graft.operators.IncrementalAgg.updateDistinct(
            spark, dir, batch, Seq("day"), "uid")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
      val got = graft.operators.IncrementalAgg.readDistinct(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      // sketch union across overlapping batches == distinct of the union
      assert(got === Map("d1" -> 3L, "d2" -> 1L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("observed quality gates: metrics accumulate during the action, no extra pass") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 120.0), (4L, 7.0))
      .toDF("id", "v")
    val gated = graft.operators.Profile.observed(df, "gate", Seq(
      "n_negative" -> (col("v") < 0),
      "n_outlier" -> (col("v") > 100)))
    gated.collect() // one action; metrics ride along
    val m = gated.queryExecution.observedMetrics("gate")
    assert(m.getAs[Long]("n_rows") === 4L)
    assert(m.getAs[Long]("n_negative") === 1L)
    assert(m.getAs[Long]("n_outlier") === 1L)
  }

  test("snapshotDiff: added/removed/changed classified; null values compare safely") {
    import spark.implicits._
    val old = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "v")
    val neu = Seq((1L, Some("a"), 10.0),              // unchanged → dropped
      (2L, Some("B"), 20.0),                          // changed value
      (3L, None: Option[String], 30.0),               // null == null → unchanged
      (5L, Some("e"), 50.0))                          // added
    .toDF("k", "s", "v")
    val got = Diff.snapshotDiff(old, neu, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 4L -> "removed", 5L -> "added"))
  }

  test("mergeUpsert: update wins incl. explicit NULL, no-op reports unchanged") {
    import spark.implicits._
    val base = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
      (3L, Some("c"), 30.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "v")
    val upd = Seq((2L, Some("B"), 20.0),              // real update
      (3L, None: Option[String], 30.0),               // update sets NULL
      (4L, Some("d"), 40.0),                          // no-op resubmission
      (9L, Some("z"), 90.0))                          // insert
      .toDF("k", "s", "v")
    val got = Diff.mergeUpsert(base, upd, Seq("k"), Seq("s", "v"))
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getDouble(2)), r.getString(3)))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 9L))
    assert(got(1L) === ((Some("a"), 10.0), "unchanged")) // untouched base
    assert(got(2L) === ((Some("B"), 20.0), "updated"))
    // the deliberate NULL must WIN over the base value, not coalesce
    assert(got(3L) === ((None, 30.0), "updated"))
    assert(got(4L) === ((Some("d"), 40.0), "unchanged"))
    assert(got(9L) === ((Some("z"), 90.0), "inserted"))
  }

  test("q_time_travel: seq-3 change invisible, same-seq delete beats update") {
    val got = graft.SparkEntry.queries("q_time_travel")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2))).toMap
    val base = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderkey") < 20000)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2))).toMap
    base.foreach { case (k, (st, pr)) =>
      if (k % 19 == 0) assert(!got.contains(k), s"key $k not deleted")
      else {
        val (gs, gp) = got(k)
        if (k % 7 == 0) assert(gs === "X", s"key $k status")
        else assert(gs === st, s"key $k status unchanged")
        if (k % 7 == 0) assert(gp === pr)            // seq-2 full image
        else if (k % 11 == 0) assert(gp === pr + 100.0)
        else assert(gp === pr)
        // %5 seq-3 zeroing must NOT be visible anywhere
        assert(gp != 0.0 || pr == 0.0, s"key $k leaked seq 3")
      }
    }
    assert(got.keySet === base.keySet.filterNot(_ % 19 == 0))
  }

  test("schema evolution: mergeSchema unions columns, old rows null-fill") {
    // the drift case a long-lived table hits: a writer starts emitting
    // a new column; existing files must stay readable with the new
    // column null — no rewrite, no failure
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 30.5)).toDF("id", "s", "score")
      .write.mode("append").parquet(dir)
    val all = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(all.columns.sorted.toSeq === Seq("id", "s", "score"))
    val rows = all.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("score")))
      .toMap
    assert(rows === Map(1L -> None, 2L -> None, 3L -> Some(30.5)))
    // and WITHOUT mergeSchema the read still succeeds on one footer's
    // schema — evolution never poisons existing readers
    assert(spark.read.parquet(dir).count() === 3)
  }
}
