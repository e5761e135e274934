package graft

/** Audit tool: list every query whose physical plan contains an
  * UNPARTITIONED Window operator (`partitionSpec.isEmpty` on the
  * operator tree — a single-task global sort of its input frame),
  * with the offending operator. Regenerates the raw data behind
  * PlanSpec's `boundedGlobalWindows` allowlist; run it when that test
  * fails to see what changed: sbt 'Test/runMain graft.WindowSweep'.
  */
object WindowSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val names = (SparkEntry.queries.keySet -- SparkEntry.sideEffecting)
      .toSeq.sorted
    names.foreach { n =>
      try {
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          .queryExecution.sparkPlan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty => w
          }.foreach(w => println(s"UNPART\t$n\t${w.simpleString(160)}"))
      } catch { case e: Exception =>
        println(s"ERR\t$n\t${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println("SWEEP DONE")
    spark.stop()
  }
}
