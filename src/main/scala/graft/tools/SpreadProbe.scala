package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic: measures whether compute-dense document kernels are
  * scan-partition-starved (single-row-group parquet ⇒ 1-task first stage)
  * and what an explicit spread buys. Not part of the library surface.
  */
object SpreadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create()
    val docs = graft.Tables.documents(spark, dir)
    println(s"scan partitions: ${docs.rdd.getNumPartitions}, cores: ${spark.sparkContext.defaultParallelism}")

    def kernel(df: org.apache.spark.sql.DataFrame): Long = {
      // langid-shaped load: per-char trigram explode + agg
      df.select(explode(expr(
        "transform(sequence(1, greatest(length(text)-2, 0)), i -> substring(text, i, 3))")).as("g"))
        .groupBy("g").count().orderBy(desc("count")).limit(20).collect().length
    }
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f; val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s ($n rows)")
    }
    time("as-is   ")(kernel(docs))
    time("spread32")(kernel(docs.repartition(spark.sparkContext.defaultParallelism)))
    spark.stop()
  }
}
