package graft.tools

/** Diagnostic CLI: print the executed physical plan of one or more
  * driver-contract queries. The per-round scale audit reads these plans
  * (pruned scans, broadcast sides, shuffle keys) — this makes that a
  * one-liner instead of an ad-hoc REPL session.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <queryName>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <queryName>...")
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    try args.tail.foreach { q =>
      val fn = graft.SparkEntry.queries.getOrElse(q,
        throw new IllegalArgumentException(
          s"unknown query $q; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      println(s"===== $q =====")
      println(fn(spark, args.head).queryExecution.executedPlan.toString)
    } finally spark.stop()
  }
}
