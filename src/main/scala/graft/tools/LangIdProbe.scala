package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: split q27 langid into train-side (exploded-trigram profile
  * aggregation) and full-query walls. Usage: LangIdProbe <sfDir> [reps]. */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.expressions.{TextExprs => TE}
    import graft.functions.{TextFunctions => TF}
    TE.register(spark)
    val docs = graft.Tables.documentsSpread(spark, dir)
    val train = docs.filter(col("doc_id") % 4 === 0)
    val gramsOf = TE.distinct_char_ngrams(TF.normalizeWs(col("text")), 3)
    for (rep <- 1 to reps) {
      var t0 = System.nanoTime()
      val counts = train.select(col("lang"), explode(gramsOf).as("g"))
        .groupBy(col("lang").as("plabel"), col("g"))
        .agg(count(lit(1)).as("n"))
      counts.write.format("noop").mode("overwrite").save()
      println(f"[probe] rep$rep train-agg: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      docs.select(col("doc_id"), TE.xx_sorted_hash(gramsOf).as("gh"))
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] rep$rep classify-map: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      graft.SparkEntry.queries("q27_langid")(spark, dir).count()
      println(f"[probe] rep$rep q27 full: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
