package graft.segment

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.{Beat, Ids, SpanForBeats}

/** G3/G4/G5 beat generation (reference:
  * src/lakehouse/aggregation/beats.py:126-377).
  *
  * The heuristic path's running-duration reset is loop-carried state that
  * no window expression can express (SURVEY §2.10), so this is the one
  * place we drop to `groupByKey(episode).flatMapGroups`: the shuffle key
  * is episode_id (same key the window formulation would shuffle on), and
  * each group is one episode — bounded, sortable in memory, exactly the
  * reference's per-episode loop but distributed across executors.
  */
object Beats {

  final case class Config(
      similarityThreshold: Double = 0.7,  // G3 semantic boundary
      maxBeatDuration: Double = 180.0,    // G4 running-duration cap
      timeGap: Double = 5.0,              // G4 gap boundary
      minSpansPerBeat: Int = 1,
      maxSpansPerBeat: Option[Int] = None,
      useEmbeddings: Boolean = true)

  /** Boundary indices for one episode's time-sorted spans. Faithful to
    * beats.py:219-279: speaker change and gap reset the running duration
    * WITHOUT counting the boundary span; exceeding max duration breaks
    * and resets. Semantic mode (beats.py:126-217) replaces speaker/gap
    * logic with a cosine test when both embeddings exist. */
  private[segment] def boundaries(spans: IndexedSeq[SpanForBeats], cfg: Config): IndexedSeq[Int] = {
    val useSem = cfg.useEmbeddings && spans.forall(_.embedding.isDefined)
    val b = IndexedSeq.newBuilder[Int]
    b += 0
    if (useSem) {
      for (i <- 1 until spans.length) {
        val sim = cosineClipped(spans(i - 1).embedding.get, spans(i).embedding.get)
        if (sim < cfg.similarityThreshold) b += i
      }
    } else {
      var currentSpeaker = spans.head.speaker
      var currentDuration = 0.0
      for (i <- 1 until spans.length) {
        val s = spans(i)
        val prev = spans(i - 1)
        if (s.speaker != currentSpeaker) {
          b += i; currentSpeaker = s.speaker; currentDuration = 0.0
        } else if (s.start_time - prev.end_time > cfg.timeGap) {
          b += i; currentDuration = 0.0
        } else {
          currentDuration += s.duration
          if (currentDuration > cfg.maxBeatDuration) {
            b += i; currentDuration = 0.0
          }
        }
      }
    }
    b.result()
  }

  /** Clipped cosine (reference quirk, beats.py:198-217). */
  private def cosineClipped(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else math.max(0.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
  }

  /** Assemble beats for one episode (beats.py:281-377 + A20 coverage). */
  private[segment] def assemble(episodeId: String, sorted: IndexedSeq[SpanForBeats],
      bIdx: IndexedSeq[Int], cfg: Config): Iterator[Beat] = {
    val bounds = bIdx :+ sorted.length
    val out = IndexedSeq.newBuilder[Beat]
    var position = 0
    for (k <- 0 until bounds.length - 1) {
      var group = sorted.slice(bounds(k), bounds(k + 1))
      if (group.length >= cfg.minSpansPerBeat) {
        cfg.maxSpansPerBeat.foreach { m => if (group.length > m) group = group.take(m) }
        val text = group.map(_.text).mkString(" ")
        val spanIds = group.map(_.span_id)
        val speakers = group.map(_.speaker).distinct // order-preserving (E4)
        val expertIds = group.filter(_.is_expert).map(_.span_id)
        // A20: token-weighted expert share; falls back to chars when texts
        // have no tokens (speaker_roles.py:344-420)
        val tokens = group.map(s => s.text.split("\\s+").count(_.nonEmpty))
        val totalTok = tokens.sum
        val expertTok = group.zip(tokens).filter(_._1.is_expert).map(_._2).sum
        val coverage =
          if (totalTok > 0) 100.0 * expertTok / totalTok
          else {
            val chars = group.map(_.text.length)
            val t = chars.sum
            if (t > 0) 100.0 * group.zip(chars).filter(_._1.is_expert).map(_._2).sum / t else 0.0
          }
        out += Beat(
          beat_id = Ids.beatId(episodeId, position, spanIds, text),
          episode_id = episodeId,
          start_time = group.head.start_time,
          end_time = group.last.end_time,
          duration = group.last.end_time - group.head.start_time,
          text = text,
          span_ids = spanIds,
          speakers_set = speakers,
          expert_span_ids = expertIds,
          expert_coverage_pct = coverage,
          topic_label = None)
        position += 1
      }
    }
    out.result().iterator
  }

  /** Distributed beat generation. `spans` needs SpanForBeats columns;
    * attach span embeddings beforehand (pre-join) for semantic mode. */
  def generate(spans: Dataset[SpanForBeats], cfg: Config = Config()): Dataset[Beat] = {
    val spark = spans.sparkSession
    import spark.implicits._
    spans.groupByKey(_.episode_id).flatMapGroups { (ep, it) =>
      val sorted = it.toIndexedSeq.sortBy(s => (s.start_time, s.end_time, s.span_id))
      if (sorted.isEmpty) Iterator.empty
      else assemble(ep, sorted, boundaries(sorted, cfg), cfg)
    }
  }

  /** DataFrame adapter: select/convert, optionally joining an embeddings
    * frame (artifact_id, embedding) for the semantic path. */
  def generateFromDf(spans: DataFrame, embeddings: Option[DataFrame] = None,
      cfg: Config = Config()): Dataset[Beat] = {
    val spark = spans.sparkSession
    import spark.implicits._
    val withEmb = embeddings match {
      case Some(e) => spans.join(
        e.select(col("artifact_id").as("span_id"), col("embedding")), Seq("span_id"), "left")
      case None => spans.withColumn("embedding", lit(null).cast("array<float>"))
    }
    withEmb.select("span_id", "episode_id", "speaker", "is_expert",
        "start_time", "end_time", "duration", "text", "embedding")
      .as[SpanForBeats]
      .transform(generate(_, cfg))
  }
}
