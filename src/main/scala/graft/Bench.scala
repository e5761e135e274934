package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass (table
  * counts + one small query) absorbs session start, file-index listing,
  * and first-codegen costs so per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table (file-index + footer caches) and force
    // one codegen'd aggregation through the pipeline
    Tables.all.foreach { t =>
      try Tables.t(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    // A crashing query must not masquerade as a timing: failures are
    // listed in a "failed" key and logged, never folded in silently.
    // optional first arg: comma-separated query names (fast iteration on
    // one hotspot without the full sweep). Unknown names are loud — a
    // typo'd or misplaced arg must not masquerade as an instant pass.
    val subset = args.headOption.map(_.split(",").toSet)
    subset.foreach { ss =>
      val unknown = ss -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(
          s"[bench] WARNING: unknown query names skipped: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
    val results = picked.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
