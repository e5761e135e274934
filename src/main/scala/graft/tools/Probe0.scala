package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Scratch profiling main for the optimization round: times labeled
  * sub-pieces of hot queries with the noop sink (guide §1.4) so the
  * expensive stage is identified by measurement, not guesswork.
  * Not part of the driver contract; safe to edit freely.
  */
object Probe0 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    // extra configs from SPARK_GRAFT_CONF="k=v;k=v" for A/B probing
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      // warm: 2 runs, report both
      val t0 = System.nanoTime(); f; val d1 = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      val t1 = System.nanoTime(); f; val d2 = (System.nanoTime() - t1) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      println(f"[probe] $label%-40s run1=$d1%7.3f run2=$d2%7.3f")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup like Bench
    graft.Tables.all.foreach { n => try t(spark, sfDir, n).count() catch { case _: Throwable => () } }

    val s = spark
    // --- g_pagerank decomposition ---
    def edges = t(s, sfDir, "orders")
      .join(t(s, sfDir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

    // stage-level accounting: task time, GC, #tasks, max task
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        acc.add((i.stageId, i.taskMetrics.executorRunTime,
          i.taskMetrics.jvmGCTime, i.numTasks,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)))
      }
    })
    def report(label: String)(f: => Unit): Unit = {
      acc.clear()
      val gcBefore = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        .stream.mapToLong(_.getCollectionTime).sum
      val t0 = System.nanoTime(); f; val d = (System.nanoTime() - t0) / 1e9
      val gcAfter = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        .stream.mapToLong(_.getCollectionTime).sum
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val st = acc.asScala.toSeq
      val taskTime = st.map(_._2).sum / 1e3
      val gc = st.map(_._3).sum / 1e3
      val wall = st.map(_._5).sum / 1e3
      println(f"[report] $label%-32s wall=$d%7.3f stages=${st.size}%3d stageWallSum=$wall%7.3f taskTimeSum=$taskTime%8.3f execGC=$gc%6.3f driverGC=${(gcAfter-gcBefore)/1e3}%6.3f")
      st.sortBy(-_._5).take(5).foreach { case (id, rt, g, n, w) =>
        println(f"[stage]    id=$id%4d tasks=$n%3d wall=${w/1e3}%7.3f taskSum=${rt/1e3}%7.3f gc=${g/1e3}%6.3f")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // --- current targets ---
    for (q <- Seq("t_quality_train", "t_quality_train_eval",
                  "t_quality_warm_start", "t_quality_calibration",
                  "t_dsir_weights", "t_domain_reweight");
         r <- 1 to 3)
      report(s"$q r$r") { graft.SparkEntry.queries(q)(s, sfDir).count() }
    if (sys.env.contains("GRAFT_PROBE_SHORT")) { spark.stop(); return }
    // FileOps fixture-write A/B: spread cap 8 vs uncapped
    def moveFixture(cap: Int): Unit = {
      val root = System.getProperty("java.io.tmpdir") +
        "/graft_probe_move_" + java.util.UUID.randomUUID().toString.take(8)
      val rawUri = s"file:$root/raw"
      graft.operators.Par.spread(
          t(s, sfDir, "documents").filter(col("doc_id") < 400)
            .select("doc_id", "text"), cap = cap)
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          val fs = new org.apache.hadoop.fs.Path(rawUri)
            .getFileSystem(new org.apache.hadoop.conf.Configuration())
          it.foreach { r =>
            val p = new org.apache.hadoop.fs.Path(rawUri, s"doc_${r.getLong(0)}.json")
            val out = fs.create(p, true)
            out.write(s"""{"x":"${r.getString(1)}"}"""
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            out.close()
          }
        }
      val rp = new org.apache.hadoop.fs.Path(s"file:$root")
      rp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(rp, true)
    }
    for (r <- 1 to 3) {
      report(s"move cap8 r$r")(moveFixture(8))
      report(s"move uncapped r$r")(moveFixture(Int.MaxValue))
    }
    for (q <- Seq("m_spectrogram", "m_audio_segments",
                  "a_pipeline_move"); r <- 1 to 2)
      report(s"$q r$r") { graft.SparkEntry.queries(q)(s, sfDir).count() }
    // q_spearman A/B: current (unspread checkpoint) vs spread-first
    def spearman(l0: org.apache.spark.sql.DataFrame): Long = {
      val l = l0.localCheckpoint(false)
      val rx = graft.operators.Ranks.avgRanks(l.select("x"), "x")
        .select(col("x"), col("rank_x2").as("rx2"))
      val ry = graft.operators.Ranks.avgRanks(l.select("y"), "y")
        .select(col("y"), col("rank_x2").as("ry2"))
      val n1 = l.groupBy().agg((count(lit(1)) + 1L).as("np1"))
      l.join(broadcast(rx), "x").join(ry, "y")
        .crossJoin(broadcast(n1))
        .withColumn("cx", col("rx2") - col("np1"))
        .withColumn("cy", col("ry2") - col("np1"))
        .groupBy()
        .agg((max("np1") - 1L).as("n"),
          sum((col("cx") * col("cy")).cast("decimal(38,0)"))
            .cast("double").as("sxy"),
          sum((col("cx") * col("cx")).cast("decimal(38,0)"))
            .cast("double").as("sxx"),
          sum((col("cy") * col("cy")).cast("decimal(38,0)"))
            .cast("double").as("syy"))
        .count()
    }
    def spearL = t(s, sfDir, "lineitem")
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    for (r <- 1 to 2) {
      report(s"spearman cur r$r")(spearman(spearL))
      report(s"spearman spread r$r")(spearman(graft.operators.Par.spread(spearL)))
    }
    // changed queries, whole
    for (q <- Seq("t_assoc_rules", "t_quality_train", "t_dsir_weights",
                  "t_domain_reweight"); r <- 1 to 2)
      report(s"$q r$r") { graft.SparkEntry.queries(q)(s, sfDir).count() }
    // unexamined hot queries: stage shape
    for (q <- Seq("g_pagerank", "d_cdc_chunks", "t_ppl_buckets",
                  "q2_min_cost_supplier", "sql_latest_per_key",
                  "m_spectrogram", "s_nn_descent", "g_kcore",
                  "a_pipeline_curate_dedup"); r <- 1 to 2)
      report(s"$q r$r") { graft.SparkEntry.queries(q)(s, sfDir).count() }
    spark.stop()
  }
}
