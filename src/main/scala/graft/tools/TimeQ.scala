package graft.tools

/** Steady-state per-query latency probe: runs each named query N times in
  * one warm JVM and prints per-run wall times — the companion to
  * [[PlanDump]] for chasing regressions that BENCH's one-shot numbers
  * can't separate from JIT noise (usage: TimeQ <sfDir> <query>...). */
object TimeQ {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQ <sfDir> <queryName>...")
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    try args.tail.foreach { qn =>
      val fn = graft.SparkEntry.queries.getOrElse(qn,
        throw new IllegalArgumentException(s"unknown query $qn"))
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, args.head).collect().length
        println(f"$qn run$i: ${(System.nanoTime() - t0) / 1e6}%.0f ms ($n rows)")
      }
    } finally spark.stop()
  }
}
