package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints the formatted physical plan of one
  * or all SparkEntry queries. Used to keep plans honest at scale —
  * PushedFilters reaching the parquet scan, broadcast joins on
  * dimension tables, WholeStageCodegen spans covering the hot path.
  *
  *   sbt 'runMain graft.Explain [queryName] [sfDir]'
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // comma-separated names supported: one sbt/session spin-up per
    // optimization batch instead of one per query
    val targets = name match {
      case Some(n) => n.split(",").toSeq.map(q => q -> SparkEntry.queries(q))
      case None    => SparkEntry.queries.toSeq.sortBy(_._1)
    }
    targets.foreach { case (n, fn) =>
      println(s"\n========== $n ==========")
      if (SparkEntry.sideEffecting(n))
        println(s"(skipped: $n performs real file I/O when invoked — " +
          "run it through Verify/Bench instead)")
      else fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
