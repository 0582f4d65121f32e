package graft.segment

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.{BeatForSections, Ids, Section}

/** G6/G7 section generation (reference:
  * src/lakehouse/aggregation/sections.py:121-573).
  *
  * The packing decision depends on a running duration that resets at each
  * break — inherently sequential per episode, so `flatMapGroups` on
  * episode_id (one shuffle; groups bounded by episode length).
  */
object Sections {

  final case class Config(
      minDurationMin: Double = 5.0,
      targetDurationMin: Double = 8.0,
      maxDurationMin: Double = 12.0,
      allowSemanticOverflow: Boolean = true,
      boundarySimilarityThreshold: Double = 0.5,
      strongBoundaryMultiplier: Double = 0.6,
      semanticCheckMultiplier: Double = 1.5,
      preferTimeBoundaries: Boolean = false,
      timeGap: Double = 30.0,
      /** When true (with semantic mode preferred), refuse to run below
        * `minEmbeddingCoveragePct` beat-embedding coverage instead of
        * silently degrading per-pair (sections.py:455-463's 80% gate). */
      requireEmbeddings: Boolean = false,
      preferSemanticBoundaries: Boolean = true,
      minEmbeddingCoveragePct: Double = 80.0) {
    def minDuration: Double = minDurationMin * 60.0
    def targetDuration: Double = targetDurationMin * 60.0
    def maxDuration: Double = maxDurationMin * 60.0
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def hasBoundary(prev: BeatForSections, next: BeatForSections, cfg: Config): Boolean =
    (prev.embedding, next.embedding) match {
      case (Some(a), Some(b)) => cosine(a, b) < cfg.boundarySimilarityThreshold
      case _                  => false // no topic labels in our pipeline
    }

  private def hasStrongBoundary(prev: BeatForSections, next: BeatForSections, cfg: Config): Boolean =
    (prev.embedding, next.embedding) match {
      case (Some(a), Some(b)) =>
        cosine(a, b) < cfg.boundarySimilarityThreshold * cfg.strongBoundaryMultiplier
      case _ => false
    }

  /** Faithful port of sections.py:193-272 decision order. */
  private[segment] def shouldBreak(current: Vector[BeatForSections], next: BeatForSections,
      currentDuration: Double, cfg: Config): Boolean = {
    if (current.isEmpty) return false
    if (currentDuration < cfg.minDuration) return false
    val potential = currentDuration + next.duration
    if (cfg.preferTimeBoundaries) return potential >= cfg.targetDuration
    if (potential > cfg.maxDuration) {
      if (cfg.allowSemanticOverflow) return hasBoundary(current.last, next, cfg)
      return true
    }
    if (currentDuration >= cfg.minDuration * cfg.semanticCheckMultiplier &&
        hasBoundary(current.last, next, cfg) &&
        hasStrongBoundary(current.last, next, cfg)) return true
    if (currentDuration >= cfg.targetDuration * 0.8 &&
        hasBoundary(current.last, next, cfg)) return true
    if (next.start_time - current.last.end_time > cfg.timeGap) return true
    false
  }

  private[segment] def pack(episodeId: String, sorted: IndexedSeq[BeatForSections],
      cfg: Config): Iterator[Section] = {
    val out = IndexedSeq.newBuilder[Section]
    var current = Vector.empty[BeatForSections]
    var currentDuration = 0.0
    var position = 0

    def emit(): Unit = if (current.nonEmpty) {
      val text = current.map(_.text).mkString(" ")
      val beatIds = current.map(_.beat_id)
      out += Section(
        section_id = Ids.sectionId(episodeId, position, beatIds, text),
        episode_id = episodeId,
        start_time = current.head.start_time,
        end_time = current.last.end_time,
        duration_minutes = (current.last.end_time - current.head.start_time) / 60.0,
        text = text,
        beat_ids = beatIds,
        title = s"Section ${position + 1}", // G7 placeholder titles
        synopsis = Some("Auto-generated section"))
      position += 1
    }

    for (beat <- sorted) {
      if (shouldBreak(current, beat, currentDuration, cfg)) {
        emit()
        current = Vector(beat)
        currentDuration = beat.duration
      } else {
        current = current :+ beat
        currentDuration += beat.duration
      }
    }
    emit()
    out.result().iterator
  }

  def generate(beats: Dataset[BeatForSections], cfg: Config = Config()): Dataset[Section] = {
    val spark = beats.sparkSession
    import spark.implicits._
    beats.groupByKey(_.episode_id).flatMapGroups { (ep, it) =>
      val sorted = it.toIndexedSeq.sortBy(b => (b.start_time, b.end_time, b.beat_id))
      pack(ep, sorted, cfg)
    }
  }

  /** DataFrame adapter with optional beat-embedding pre-join (the
    * reference loads beat embeddings from parquet inside the generator,
    * sections.py:380-480; we pre-join — same data, one clean plan).
    *
    * With `cfg.requireEmbeddings && cfg.preferSemanticBoundaries`, the
    * reference's release gate applies (sections.py:411-463): no
    * embeddings frame at all is an error, and joined coverage below
    * `cfg.minEmbeddingCoveragePct` is an error naming the coverage —
    * semantic sections silently computed from a half-embedded corpus
    * would move boundaries without anyone noticing. */
  def generateFromDf(beats: DataFrame, embeddings: Option[DataFrame] = None,
      cfg: Config = Config()): Dataset[Section] = {
    val spark = beats.sparkSession
    import spark.implicits._
    val gated = cfg.requireEmbeddings && cfg.preferSemanticBoundaries
    if (gated && embeddings.isEmpty)
      throw new IllegalArgumentException(
        "beat embeddings required for semantic section generation but not provided; " +
          "generate embeddings first or set requireEmbeddings=false")
    val withEmb = embeddings match {
      case Some(e) => beats.join(
        e.select(col("artifact_id").as("beat_id"), col("embedding")), Seq("beat_id"), "left")
      case None => beats.withColumn("embedding", lit(null).cast("array<float>"))
    }
    if (gated) {
      val row = withEmb.agg(
        count(lit(1)).as("n"),
        sum(when(col("embedding").isNotNull, 1L).otherwise(0L)).as("with_emb")).first()
      val n = row.getAs[Long]("n")
      val covered = Option(row.getAs[java.lang.Long]("with_emb")).map(_.longValue()).getOrElse(0L)
      val pct = if (n > 0) 100.0 * covered / n else 0.0
      if (pct < cfg.minEmbeddingCoveragePct)
        throw new IllegalArgumentException(
          f"insufficient embedding coverage for semantic sections: $pct%.1f%% < " +
            f"${cfg.minEmbeddingCoveragePct}%.1f%% ($covered/$n beats); " +
            "generate embeddings for all beats or set requireEmbeddings=false")
    }
    withEmb.select("beat_id", "episode_id", "start_time", "end_time",
        "duration", "text", "embedding")
      .as[BeatForSections]
      .transform(generate(_, cfg))
  }
}
