package graft.tools

/** Dump `.explain("formatted")` for every declared query (or a named
  * subset) to one file per query under an output directory — the
  * before/after plan evidence the optimization rounds commit under
  * `plans/rNN/`. Plans are captured without executing the queries.
  *
  * Usage: runMain graft.tools.PlanDumpAll <sfDir> <outDir> [suffix] [query...]
  * Writes <outDir>/<query><suffix>.txt (suffix defaults to "_before").
  */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDumpAll <sfDir> <outDir> [suffix] [query...]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = if (args.length >= 3) args(2) else "_before"
    val names =
      if (args.length >= 4) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(outDir)
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    try names.foreach { q =>
      val fn = graft.SparkEntry.queries.getOrElse(q,
        throw new IllegalArgumentException(s"unknown query $q"))
      val plan =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      java.nio.file.Files.write(outDir.resolve(s"$q$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $q$suffix.txt (${plan.length} chars)")
    } finally spark.stop()
  }
}
