package graft.tools

/** Dev-only probe: time one driver-contract query repeatedly in a warm
  * JVM and print its formatted physical plan — separates plan regressions
  * from bench noise. Usage: runMain graft.tools.QueryProbe <name> [sfDir] [reps]. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q18_knn_exact")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).collect().length
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s rows=$n")
    }
    graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
