package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic: split q19's cost into signature materialization
  * vs banded-join + verify. Not a library surface.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = graft.GraftSession.create()
    val docs = graft.Tables.documentsSpread(spark, dir).select(col("doc_id"), col("text"))
    def time(label: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r rows)")
    }
    import graft.functions.{TextFunctions => TF}
    graft.expressions.HashFunctions.register(spark)
    graft.expressions.TextExprs.register(spark)
    // signature stage only (mirrors minhashNearDups up to the checkpoint)
    time("sig-only   ") {
      docs.select(col("doc_id"), TF.tokens(col("text")).as("tk"))
        .select(col("doc_id"), graft.expressions.TextExprs.distinct_word_ngrams(col("tk"), 2).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("hs", graft.expressions.HashFunctions.poly_hash_array(col("sh")))
        .withColumn("hsh", graft.expressions.TextExprs.xx_sorted_hash(col("sh")))
        .count()
    }
    time("full-q19   ") {
      graft.operators.Dedup.minhashNearDups(docs, "doc_id", col("text"),
        shingleWords = 2, k = 12, bands = 3, threshold = 0.5).count()
    }
    spark.stop()
  }
}
