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
    // --- current targets: decompose the hot queries stage by stage ---
    // g_link_predict pieces
    def lp_e = graft.operators.Par.spread(
        t(s, sfDir, "lineitem")
          .select(col("l_partkey").as("p"), col("l_suppkey").as("s")))
      .distinct()
    def lp_deg = lp_e.groupBy("p").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2 && col("d") <= 64)
    def lp_ew = lp_e.join(lp_deg, "p")
      .withColumn("w_e4",
        (round(lit(1.0) / log(col("d").cast("double")), 4)
          .cast("decimal(18,4)") * 10000).cast("long"))
    report("lp: e.distinct")(noop(lp_e))
    report("lp: ew (no ckpt)")(noop(lp_ew))
    for (r <- 1 to 2)
      report(s"g_link_predict r$r") {
        graft.SparkEntry.queries("g_link_predict")(s, sfDir).count() }
    // s_sparse_topk pieces
    def docs = t(s, sfDir, "documents")
    report("sp: tfidfWeights") {
      noop(graft.operators.Sparse.tfidfWeights(docs, "doc_id", "text")) }
    for (r <- 1 to 2)
      report(s"s_sparse_topk r$r") {
        graft.SparkEntry.queries("s_sparse_topk")(s, sfDir).count() }
    // s_kmeans
    for (r <- 1 to 2)
      report(s"s_kmeans r$r") {
        graft.SparkEntry.queries("s_kmeans")(s, sfDir).count() }
    // crawl wave family
    for (q <- Seq("f_priority_budget", "f_trap_gate"); r <- 1 to 2)
      report(s"$q r$r") { graft.SparkEntry.queries(q)(s, sfDir).count() }
    spark.stop()
  }
}
