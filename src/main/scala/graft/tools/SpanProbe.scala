package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic CLI: the X91 hot-gram straggler probe. Plants a fixed
  * boilerplate sentence into `hotPct`% of a corpus's documents (a
  * corpus-dominating duplicated gram — the footer/license-header regime
  * real web corpora exhibit), then times [[graft.operators.Dedup]]'s two
  * duplicated-span formulations on the planted corpus:
  *
  *   - `window`   — `count(*) over (partition by g)`: one gram shuffle,
  *                  but every occurrence of the hot gram lands in ONE
  *                  task's window sort;
  *   - `twophase` — map-side-folded gram counts → duplicated-gram set →
  *                  left-semi probe: partials bound the gram shuffle,
  *                  the hot gram costs a streaming probe.
  *
  * Each formulation runs `reps` times, alternating, on a warmed JVM;
  * wall seconds and the per-formulation span count (must agree) print
  * as one JSON line. docs/SCALE.md records the verdict.
  *
  * Usage: runMain graft.tools.SpanProbe <sfDir> [k=8] [hotPct=1] [reps=3] [repeats=1]
  */
object SpanProbe {
  private def plant(spark: SparkSession, sfDir: String, hotPct: Int,
      repeats: Int): DataFrame = {
    val boiler = ("subscribe to our newsletter for weekly updates and exclusive " +
      "member content terms of service apply " * repeats).trim
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(100)) < lit(hotPct),
          concat(col("text"), lit(" " + boiler))).otherwise(col("text")).as("text"))
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val hotPct = args.lift(2).map(_.toInt).getOrElse(1)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    // boilerplate copies per hot doc: scales the hot gram's occurrence
    // count relative to partition volume — the ratio that decides the
    // straggler, and the one that is >> 1 at 100 TB for a 1%-of-docs gram
    val repeats = args.lift(4).map(_.toInt).getOrElse(1)
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val docs = plant(spark, sfDir, hotPct, repeats)
      docs.cache().count() // isolate the formulations from scan cost
      def run(df: => DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // one throwaway warm-up each, then alternating timed reps
      run(graft.operators.Dedup.duplicatedSpansWindowed(docs, "doc_id", col("text"), k))
      run(graft.operators.Dedup.duplicatedSpans(docs, "doc_id", col("text"), k))
      val win = Array.newBuilder[Double]; val two = Array.newBuilder[Double]
      var (nWin, nTwo) = (0L, 0L)
      (1 to reps).foreach { _ =>
        val (tw, nw) = run(graft.operators.Dedup.duplicatedSpansWindowed(docs, "doc_id", col("text"), k))
        val (tt, nt) = run(graft.operators.Dedup.duplicatedSpans(docs, "doc_id", col("text"), k))
        win += tw; two += tt; nWin = nw; nTwo = nt
      }
      def med(xs: Array[Double]): Double = xs.sorted.apply(xs.length / 2)
      require(nWin == nTwo, s"formulations disagree: window=$nWin twophase=$nTwo")
      println(f"""{"sf_dir":"$sfDir","k":$k,"hot_pct":$hotPct,"repeats":$repeats,"spans":$nWin,""" +
        f""""window_med_s":${med(win.result())}%.2f,"twophase_med_s":${med(two.result())}%.2f}""")
    } finally spark.stop()
  }
}
