package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: time the quality near_dup category (MinHash-LSH at 0.95
  * over the bench's synthetic spans) standalone, reps in one JVM.
  * Usage: QualityNearDupProbe [nSpans] [reps]. */
object QualityNearDupProbe {
  def main(args: Array[String]): Unit = {
    val nSpans = if (args.length > 0) args(0).toLong else 81115L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val spans = spark.range(nSpans).select(
      format_string("spn_%08d", col("id")).as("span_id"),
      concat(
        lit("w"), col("id") % 997, lit(" w"), (col("id") * 7) % 991,
        lit(" w"), (col("id") * 13) % 983, lit(" w"), (col("id") * 29) % 977,
        lit(" w"), (col("id") * 31) % 1009, lit(" w"), (col("id") * 37) % 1013,
        lit(" seg "), col("id"), lit(" spoken words")).as("text"))
      .localCheckpoint(false)
    spans.count()
    for (rep <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.quality.Quality.nearDuplicates(spans, "span_id", 0.95)
        .select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .distinct().count()
      println(f"[probe] near_dup rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n ids)")
    }
    spark.stop()
  }
}
