package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Schemas
import graft.expressions.IdFunctions

/** JSONL/JSON transcript ingestion: read → validate (errors as rows, not
  * exceptions) → normalize (sort, position, duration, deterministic IDs).
  *
  * Spark shape of reference S1-S6/F1-F3/§3.1 (ingestion/reader.py,
  * validator.py, normalizer.py): the per-file driver loop dissolves into
  * one partitioned read; per-file error isolation becomes PERMISSIVE-mode
  * `_corrupt_record` rows; `input_file_name()` keeps per-file lineage.
  */
object Ingest {

  /** Read a directory (or single file) of JSONL transcripts. Malformed
    * lines survive as rows with non-null `_corrupt_record` (counted, not
    * thrown — reader.py:125-158 skip-with-warning semantics). */
  def readJsonl(spark: SparkSession, path: String, glob: String = "*.jsonl"): DataFrame =
    spark.read
      .schema(Schemas.rawUtterance)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("pathGlobFilter", glob)
      .json(path)
      .withColumn("source_file", input_file_name())

  /** Episode id: from the record, else the source-file stem
    * (reader.py:273-300). */
  def withEpisodeId(df: DataFrame): DataFrame =
    df.withColumn("episode_id",
      coalesce(col("episode_id"),
        regexp_extract(col("source_file"), "([^/]+?)(\\.[^./]*)?$", 1)))

  /** Validation predicates (validator.py:155-261): returns the frame with
    * an `errors` array column naming every failed rule. */
  def withValidationErrors(df: DataFrame): DataFrame = {
    def err(cond: Column, label: String): Column = when(cond, lit(label))
    val checks = array(
      err(col("_corrupt_record").isNotNull, "malformed_json"),
      err(col("_corrupt_record").isNull && col("episode_id").isNull, "missing_episode_id"),
      err(col("_corrupt_record").isNull && col("start").isNull, "missing_start"),
      err(col("_corrupt_record").isNull && col("end").isNull, "missing_end"),
      err(col("_corrupt_record").isNull && col("speaker").isNull, "missing_speaker"),
      err(col("_corrupt_record").isNull && col("text").isNull, "missing_text"),
      err(col("start") < 0, "negative_start"),
      err(col("end") < 0, "negative_end"),
      err(col("end") <= col("start"), "end_not_after_start"),
      err(trim(col("speaker")) === "", "empty_speaker"),
      err(trim(col("text")) === "", "empty_text"),
      // an empty episode_id would round-trip through the partitioned sink
      // as __HIVE_DEFAULT_PARTITION__ and read back as NULL
      err(trim(col("episode_id")) === "", "empty_episode_id"))
    df.withColumn("errors", filter(checks, e => e.isNotNull))
  }

  /** Split into (valid, errors): errors one row per violation
    * (validator.py:305-342 `ValidationError{type, ...}` as a DataFrame).
    * The checked frame is localCheckpoint'd (not cached): both outputs
    * read the one materialization, and the blocks are freed by the
    * ContextCleaner when the plans are dropped instead of pinning
    * executor storage until someone remembers to unpersist. Trade-off:
    * truncated lineage means a lost executor aborts the job instead of
    * recomputing its partitions — acceptable for this short read-split
    * window; on preemptible clusters prefer reliable `checkpoint()` or
    * re-running the (idempotent, deterministic-ID) ingest. */
  def validate(df: DataFrame): (DataFrame, DataFrame) = {
    val checked = withValidationErrors(df).localCheckpoint(false)
    val valid = checked.filter(size(col("errors")) === 0).drop("errors", "_corrupt_record")
    val errors = checked.filter(size(col("errors")) > 0)
      .select(col("source_file"), col("episode_id"),
        explode(col("errors")).as("error_type"))
    (valid, errors)
  }

  /** Normalize valid utterances: time-sort per episode, 0-based position,
    * duration, deterministic utterance_id (normalizer.py:141-216 + C3). */
  def normalize(valid: DataFrame): DataFrame = {
    IdFunctions.register(valid.sparkSession)
    val w = Window.partitionBy("episode_id")
      .orderBy(col("start"), col("end"), col("speaker"), col("text"))
    valid
      .withColumn("position", row_number().over(w) - 1)
      .withColumn("duration", col("end") - col("start"))
      .withColumn("utterance_id", IdFunctions.utterance_id(
        col("episode_id"), col("position"), col("text"), col("speaker"),
        col("start"), col("end")))
      .select("utterance_id", "episode_id", "start", "end", "speaker", "text", "duration")
  }

  /** Full pipeline: read → episode ids → validate → normalize.
    * Returns (normalized, errors). */
  def ingestDirectory(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val (valid, errors) = validate(withEpisodeId(readJsonl(spark, path)))
    (normalize(valid), errors)
  }

  /** Incremental variant (N1/J5): drop episodes already present in
    * `existing` before normalizing — a left_anti on episode_id, the exact
    * set-difference the reference implements file-by-file
    * (cli/commands/ingest.py:219-295). */
  def ingestIncremental(spark: SparkSession, path: String, existing: DataFrame): (DataFrame, DataFrame) = {
    val (valid, errors) = validate(withEpisodeId(readJsonl(spark, path)))
    val fresh = valid.join(existing.select("episode_id").distinct(), Seq("episode_id"), "left_anti")
    (normalize(fresh), errors)
  }

  /** Schema-enforced parquet sink (S7/S8): stats/dictionary are Spark
    * defaults. Partitioned by episode_id so every downstream per-episode
    * job (spans, beats, quality drill-downs) prunes to its episode's
    * files instead of scanning the corpus; `mode = "append"` is the S8
    * incremental path (new episodes land as new partition directories —
    * pair with [[ingestIncremental]] so an episode is never appended
    * twice). Set `partitionByEpisode = false` for tiny corpora where
    * per-episode files would be smaller than a parquet row group. */
  def writeNormalized(df: DataFrame, outDir: String, mode: String = "overwrite",
      partitionByEpisode: Boolean = true): Unit = {
    val w = df.write.mode(mode)
    (if (partitionByEpisode) w.partitionBy("episode_id") else w).parquet(outDir)
  }
}
