package graft.streaming

import org.apache.spark.sql.DataFrame

/** N4 (X107): streaming exact deduplication with BOUNDED state.
  *
  * The batch dedup family (A12 exact groups, X1 hash dedup) re-keys the
  * whole corpus every run; on a stream the naive
  * `dropDuplicates(keys)` keeps every key it has ever seen in the state
  * store — an unbounded-state operator that dies by memory on any
  * long-lived pipeline. `dropDuplicatesWithinWatermark` is the bounded
  * contract: a duplicate is only suppressed if it arrives within the
  * event-time watermark horizon of the first occurrence, so state
  * retires with the watermark and the live store is O(keys per
  * horizon), not O(keys ever).
  *
  * Generalizes the ingest path's content-hash dedup
  * ([[StreamingIngest]], N3) into a standalone any-keys operator.
  * That contract is exactly the production shape for ingest dedup: the
  * same document re-delivered by an at-least-once upstream arrives
  * seconds-to-minutes later, never days, so a horizon-bounded suppress
  * is the right semantics AND the only scalable one. Re-deliveries
  * farther apart than the horizon are the batch layer's job (X1 over
  * the compacted table), same division of labor as the reference's
  * nightly integrity pass.
  */
object StreamingDedup {

  /** Suppress rows whose `keys` were already seen within the watermark
    * horizon. `tsCol` must be the event-time column; `delay` is the
    * watermark (e.g. "10 minutes") — also the dedup horizon. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, delay: String,
      keys: Seq[String]): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keys)
}
