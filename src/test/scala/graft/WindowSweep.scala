package graft

/** Audit tool: list every query whose physical plan contains an
  * UNPARTITIONED Window operator (one "], [" separator instead of
  * two — a single-task global sort of its input frame), with the
  * offending plan line. Regenerates the raw data behind PlanSpec's
  * `boundedGlobalWindows` allowlist; run it when that test fails to
  * see what changed: sbt 'Test/runMain graft.WindowSweep'.
  */
object WindowSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val names = (SparkEntry.queries.keySet -- SparkEntry.sideEffecting)
      .toSeq.sorted
    names.foreach { n =>
      try {
        val plan = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          .queryExecution.sparkPlan.toString
        plan.split("\n").filter(_.contains("Window ["))
          .foreach { l0 =>
            val l = l0.substring(l0.indexOf("Window ["))
            val nSep = "\\], \\[".r.findAllIn(l).length
            if (nSep < 2) println(s"UNPART\t$n\t${l.take(160)}")
          }
      } catch { case e: Exception =>
        println(s"ERR\t$n\t${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println("SWEEP DONE")
    spark.stop()
  }
}
