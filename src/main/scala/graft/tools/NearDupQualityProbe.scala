package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic: decompose the quality-assessment near_dup
  * category (r8 2.1 s -> r10 5.2 s with a quiet-box canary) into
  * signature / banding / verify on the SAME 81k-span synthetic corpus
  * the bench uses. */
object NearDupQualityProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val n = 81115L
      val spans = spark.range(n).select(
        format_string("spn_%08d", col("id")).as("span_id"),
        concat(
          lit("w"), col("id") % 997, lit(" w"), (col("id") * 7) % 991,
          lit(" w"), (col("id") * 13) % 983, lit(" w"), (col("id") * 29) % 977,
          lit(" w"), (col("id") * 31) % 1009, lit(" w"), (col("id") * 37) % 1013,
          lit(" seg "), col("id"), lit(" spoken words")).as("text"))
        .localCheckpoint(true)
      def time(label: String)(f: => Long): Unit = {
        f // warm
        val t0 = System.nanoTime(); val r = f
        println(f"PROBE $label%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s ($r rows)")
      }
      import graft.functions.{TextFunctions => TF}
      graft.expressions.HashFunctions.register(spark)
      graft.expressions.TextExprs.register(spark)
      graft.expressions.HashFunctions.registerMinhash(spark, "graft_minhash_12",
        (0 until 12).map(graft.operators.Dedup.affineA).toArray,
        (0 until 12).map(graft.operators.Dedup.affineB).toArray)
      time("shingles") {
        spans.select(col("span_id"), TF.tokens(col("text")).as("tk"))
          .select(col("span_id"),
            graft.expressions.TextExprs.distinct_word_ngrams(col("tk"), 2).as("sh"))
          .filter(size(col("sh")) > 0).count()
      }
      time("sig+hsh") {
        spans.select(col("span_id"), TF.tokens(col("text")).as("tk"))
          .select(col("span_id"),
            graft.expressions.TextExprs.distinct_word_ngrams(col("tk"), 2).as("sh"))
          .filter(size(col("sh")) > 0)
          .withColumn("hs", graft.expressions.HashFunctions.poly_hash_array(col("sh")))
          .withColumn("sig", call_function("graft_minhash_12", col("hs")))
          .withColumn("hsh", graft.expressions.TextExprs.xx_sorted_hash(col("sh")))
          .select(col("span_id"), col("sig"), col("hsh")).count()
      }
      time("full") {
        graft.quality.Quality.nearDuplicates(spans, "span_id", 0.95).count()
      }
    } finally spark.stop()
  }
}
