package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Schemas

/** N1: the reference's `ingest --incremental` batch re-run becomes a
  * Structured Streaming file source with `Trigger.AvailableNow` +
  * checkpointing — exactly-once file-level incremental processing with
  * no driver-side bookkeeping (reference: cli/commands/ingest.py:219-295
  * tracks processed episodes by hand).
  */
object StreamingIngest {

  /** Start a one-shot (AvailableNow) incremental ingest: new files under
    * `inputDir` are validated and appended to `outDir`. Returns after the
    * backlog drains. */
  def runAvailableNow(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String): Unit = {
    val raw = spark.readStream
      .schema(Schemas.rawUtterance)
      .option("pathGlobFilter", "*.jsonl")
      .json(inputDir)
      .withColumn("source_file", input_file_name())
    val valid = graft.ingest.Ingest.withValidationErrors(
        graft.ingest.Ingest.withEpisodeId(raw))
      .filter(size(col("errors")) === 0)
      .drop("errors", "_corrupt_record")
      .withColumn("duration", col("end") - col("start"))
    val q = valid.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Event-time windowed rollup with watermarking over a stream of
    * timestamped events — the streaming upgrade path for the reference's
    * 5-minute dedup bins (SURVEY §2.9). */
  def windowedCounts(events: DataFrame, tsCol: String, windowLen: String,
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming corpus-quality monitor: per event-time window, the pass
    * rate of the deterministic quality score against `minScore` plus
    * mean score — the live dashboard view of the batch Gopher/quality
    * battery, so a bad upstream batch shows up within a window length
    * instead of at the next full assessment. Map-only scoring + one
    * windowed agg; state bounded by the watermark. */
  def qualityMonitor(docs: DataFrame, tsCol: String, textCol: String,
      windowLen: String, watermark: String,
      minScore: Double = 0.5): DataFrame =
    docs
      .withColumn("_score", graft.operators.TextAnalysis.qualityScore(col(textCol)))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_score") >= minScore, 1L).otherwise(0L)).as("n_pass"),
        avg(col("_score")).as("avg_score"))
      .withColumn("pass_rate", col("n_pass").cast("double") / col("n_docs"))

  /** Streaming exact dedup (X1's streaming form): normalize the text,
    * key on its sha-256, and keep the first arrival per key within the
    * watermark horizon. `dropDuplicatesWithinWatermark` bounds the dedup
    * state to the horizon — a plain streaming dropDuplicates would grow
    * its state store forever on an unbounded corpus, which is the thing
    * that actually falls over at ingest-pipeline scale. Exactness within
    * the horizon, at-most-once-per-horizon beyond it (re-sends older than
    * the watermark may re-emit; route those to the batch dedup pass). */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    docs
      .withColumn("content_hash",
        sha2(lower(trim(regexp_replace(col(textCol), "\\s+", " "))), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
