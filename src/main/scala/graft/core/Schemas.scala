package graft.core

import org.apache.spark.sql.types._

/** Fixed artifact schemas (reference: src/lakehouse/schemas.py:12-93),
  * as StructTypes for DataFrame enforcement plus case classes for the
  * typed Dataset API (flatMapGroups segmentation, tests).
  */
object Schemas {

  val utterance: StructType = StructType(Seq(
    StructField("utterance_id", StringType, nullable = false),
    StructField("episode_id", StringType, nullable = false),
    StructField("start", DoubleType, nullable = false),
    StructField("end", DoubleType, nullable = false),
    StructField("speaker", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("duration", DoubleType, nullable = false)))

  val span: StructType = StructType(Seq(
    StructField("span_id", StringType, nullable = false),
    StructField("episode_id", StringType, nullable = false),
    StructField("speaker", StringType, nullable = false),
    StructField("speaker_canonical", StringType, nullable = false),
    StructField("speaker_role", StringType, nullable = false),
    StructField("is_expert", BooleanType, nullable = false),
    StructField("start_time", DoubleType, nullable = false),
    StructField("end_time", DoubleType, nullable = false),
    StructField("duration", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("utterance_ids", ArrayType(StringType, containsNull = false), nullable = false)))

  val beat: StructType = StructType(Seq(
    StructField("beat_id", StringType, nullable = false),
    StructField("episode_id", StringType, nullable = false),
    StructField("start_time", DoubleType, nullable = false),
    StructField("end_time", DoubleType, nullable = false),
    StructField("duration", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("span_ids", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("speakers_set", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("expert_span_ids", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("expert_coverage_pct", DoubleType, nullable = false),
    StructField("topic_label", StringType, nullable = true)))

  val section: StructType = StructType(Seq(
    StructField("section_id", StringType, nullable = false),
    StructField("episode_id", StringType, nullable = false),
    StructField("start_time", DoubleType, nullable = false),
    StructField("end_time", DoubleType, nullable = false),
    StructField("duration_minutes", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("beat_ids", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("synopsis", StringType, nullable = true)))

  val embedding: StructType = StructType(Seq(
    StructField("artifact_id", StringType, nullable = false),
    StructField("artifact_type", StringType, nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("model_name", StringType, nullable = false),
    StructField("model_version", StringType, nullable = true)))

  /** Raw input records: schemaless JSON with 5 required keys
    * (reference: src/lakehouse/ingestion/validator.py:17-23). */
  val rawUtterance: StructType = StructType(Seq(
    StructField("episode_id", StringType, nullable = true),
    StructField("start", DoubleType, nullable = true),
    StructField("end", DoubleType, nullable = true),
    StructField("speaker", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("_corrupt_record", StringType, nullable = true)))
}

final case class Utterance(
    utterance_id: String, episode_id: String, start: Double, end: Double,
    speaker: String, text: String, duration: Double)

final case class Span(
    span_id: String, episode_id: String, speaker: String,
    speaker_canonical: String, speaker_role: String, is_expert: Boolean,
    start_time: Double, end_time: Double, duration: Double, text: String,
    utterance_ids: Seq[String])

/** Span narrowed to what beat generation needs (+ optional embedding). */
final case class SpanForBeats(
    span_id: String, episode_id: String, speaker: String, is_expert: Boolean,
    start_time: Double, end_time: Double, duration: Double, text: String,
    embedding: Option[Seq[Float]])

final case class Beat(
    beat_id: String, episode_id: String, start_time: Double, end_time: Double,
    duration: Double, text: String, span_ids: Seq[String],
    speakers_set: Seq[String], expert_span_ids: Seq[String],
    expert_coverage_pct: Double, topic_label: Option[String])

/** Beat narrowed to what section packing needs (+ optional embedding). */
final case class BeatForSections(
    beat_id: String, episode_id: String, start_time: Double, end_time: Double,
    duration: Double, text: String, embedding: Option[Seq[Float]])

final case class Section(
    section_id: String, episode_id: String, start_time: Double, end_time: Double,
    duration_minutes: Double, text: String, beat_ids: Seq[String],
    title: String, synopsis: Option[String])

final case class SpeakerRole(canonical: String, role: String, isExpert: Boolean)
