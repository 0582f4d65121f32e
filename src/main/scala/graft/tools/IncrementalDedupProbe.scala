package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Diagnostic CLI: does X108's incremental near-dup actually cost
  * delta-proportional work, or did the persisted index just move the
  * full-corpus cost around? Splits a corpus into base (1−deltaPct) and
  * delta, writes the base's [[Dedup.nearDupIndex]] to parquet (timed —
  * the amortized one-off), then times, alternating on a warm JVM:
  *
  *   - `full`        — `minhashNearDups` over the whole corpus (what a
  *                     naive per-batch rerun pays);
  *   - `incremental` — `incrementalNearDups` with the index READ FROM
  *                     PARQUET (what the production batch pays).
  *
  * Also counts both outputs: incremental rows must equal the full run's
  * delta-touching rows (the q105 contract, re-checked here at whatever
  * sf the probe runs).
  *
  * Usage: runMain graft.tools.IncrementalDedupProbe <sfDir> [deltaPct=5] [reps=3]
  */
object IncrementalDedupProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val deltaPct = args.lift(1).map(_.toInt).getOrElse(5)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val isDelta = pmod(col("doc_id"), lit(100)) < lit(deltaPct)
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft_inc_probe").toString + "/index"

      val t0 = System.nanoTime()
      Dedup.nearDupIndex(docs.filter(!isDelta), "doc_id", col("text"),
          shingleWords = 2, k = 12)
        .write.mode("overwrite").parquet(idxDir)
      val buildSec = (System.nanoTime() - t0) / 1e9

      def fullRun(): (Double, Long) = {
        val s = System.nanoTime()
        val n = Dedup.minhashNearDups(docs, "doc_id", col("text"),
          shingleWords = 2, k = 12, bands = 3, threshold = 0.5,
          maxBucket = Dedup.DefaultMaxBucket).count()
        ((System.nanoTime() - s) / 1e9, n)
      }
      def incRun(): (Double, Long) = {
        val s = System.nanoTime()
        val n = Dedup.incrementalNearDups(
          spark.read.parquet(idxDir), docs.filter(isDelta), "doc_id",
          col("text"), shingleWords = 2, k = 12, bands = 3,
          threshold = 0.5, maxBucket = Dedup.DefaultMaxBucket).count()
        ((System.nanoTime() - s) / 1e9, n)
      }

      // warmup once each, then alternate timed reps
      fullRun(); incRun()
      val fulls = Array.fill(reps)(0.0); val incs = Array.fill(reps)(0.0)
      var fullRows = 0L; var incRows = 0L
      for (i <- 0 until reps) {
        val (fs, fr) = fullRun(); fulls(i) = fs; fullRows = fr
        val (is, ir) = incRun(); incs(i) = is; incRows = ir
      }
      // contract re-check at this sf: full run's delta-touching rows
      val expect = Dedup.minhashNearDups(docs, "doc_id", col("text"),
          shingleWords = 2, k = 12, bands = 3, threshold = 0.5,
          maxBucket = Dedup.DefaultMaxBucket)
        .filter(pmod(col("id_a"), lit(100)) < lit(deltaPct) ||
          pmod(col("id_b"), lit(100)) < lit(deltaPct)).count()
      println(f"""{"sf":"$sfDir","delta_pct":$deltaPct,"index_build_sec":$buildSec%.2f,""" +
        f""""full_sec":${fulls.min}%.2f,"incremental_sec":${incs.min}%.2f,""" +
        f""""speedup":${fulls.min / incs.min}%.2f,""" +
        f""""full_pairs":$fullRows,"incremental_pairs":$incRows,"expected_pairs":$expect,""" +
        s""""contract_ok":${incRows == expect}}""")
    } finally spark.stop()
  }
}
