package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Stats

/** X88 streaming distribution-drift monitor: the streaming form of the
  * batch PSI report (`SparkEntry.psiDrift`) — per event-time window and
  * key, the Population Stability Index of the value histogram against a
  * static baseline profile.
  *
  * Shape notes for an unbounded stream:
  *   - Chained streaming aggregations are not allowed in append mode, so
  *     the per-bin histogram folds into ONE windowed agg as B conditional
  *     sums (B is a fixed, small bin count); PSI is then a pure row
  *     expression over those columns — no second stateful operator.
  *   - The baseline profile joins as a STATIC broadcast (a bounded model
  *     object, like IVF centroids): the stream side never shuffles beyond
  *     its windowed agg, and the join adds no state.
  *   - State is (windows within watermark) × keys × B counters — horizon-
  *     bounded, independent of stream length.
  *
  * Shares are Laplace-smoothed with the same (n + 0.5)/(N + B/2) device
  * as the batch form, so a window distributed exactly like the baseline
  * scores exactly 0.0.
  */
object StreamingDrift {

  /** Batch-side baseline builder: (keyCol, share_0..share_{B-1}),
    * smoothed. Feed any reference corpus (yesterday's data, the training
    * distribution); the output is key-cardinality-sized. */
  def baselineProfile(df: DataFrame, keyCol: String, valueCol: String,
      edges: Seq[Double]): DataFrame = {
    val b = edges.size
    val binned = df.withColumn("_bin", Stats.binIndex(col(valueCol), edges))
    val counts = (0 until b).map(i =>
      sum(when(col("_bin") === i, 1L).otherwise(0L)).as(s"_n$i"))
    binned.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"), counts: _*)
      .select(col(keyCol) +: (0 until b).map(i =>
        ((col(s"_n$i").cast("double") + lit(0.5)) /
          (col("_n").cast("double") + lit(0.5 * b))).as(s"share_$i")): _*)
  }

  /** The monitor itself. `events` may be streaming or batch (the plan is
    * identical — handy for backfill parity tests). Emits
    * (window, keyCol, n, psi). */
  def psiMonitor(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, baseline: DataFrame, edges: Seq[Double],
      windowLen: String, watermark: String): DataFrame = {
    val b = edges.size
    val binned = events
      .withColumn("_bin", Stats.binIndex(col(valueCol), edges))
      .withWatermark(tsCol, watermark)
    val counts = (0 until b).map(i =>
      sum(when(col("_bin") === i, 1L).otherwise(0L)).as(s"_n$i"))
    val agg = binned
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), counts: _*)
    val joined = agg.join(broadcast(baseline), Seq(keyCol), "left")
    // A key absent from the baseline is the STRONGEST drift signal — it
    // must alarm, not emit null psi. Missing shares coalesce to the
    // smoothed zero-count floor (0.5)/(0 + B/2) = 1/B, i.e. the share an
    // empty baseline would have been smoothed to, so an unseen key scores
    // against a uniform empty profile and produces a large finite psi.
    val terms: Seq[Column] = (0 until b).map { i =>
      val pc = (col(s"_n$i").cast("double") + lit(0.5)) /
        (col("n").cast("double") + lit(0.5 * b))
      val pb = coalesce(col(s"share_$i"), lit(1.0 / b))
      (pc - pb) * log(pc / pb)
    }
    joined
      .withColumn("psi", round(terms.reduce(_ + _), 6))
      .select(col("window"), col(keyCol), col("n"), col("psi"))
  }
}
