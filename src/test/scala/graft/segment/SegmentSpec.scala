package graft.segment

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.core.{BeatForSections, SpanForBeats, SpeakerRole}

/** Mirrors reference tests/test_aggregation.py: span break rules, text
  * concatenation, min-duration filter, beat heuristics with duration
  * reset, section time constraints, exactly-one-parent invariants. */
class SegmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def utts(rows: (String, Double, Double, String, String)*) =
    rows.toDF("episode_id", "start", "end", "speaker", "text")
      .withColumn("utterance_id",
        concat(lit("u"), monotonically_increasing_id().cast("string")))

  // -- spans (G1) ------------------------------------------------------

  test("spans break on speaker change (test_aggregation.py:186)") {
    val df = utts(
      ("E", 0.0, 2.0, "A", "one"), ("E", 2.1, 4.0, "A", "two"),
      ("E", 4.1, 6.0, "B", "three"))
    val spans = Spans.generate(df).orderBy("start_time").collect()
    assert(spans.length == 2)
    assert(spans.head.getAs[String]("text") == "one two")
    assert(spans.head.getAs[String]("speaker") == "A")
    assert(spans(1).getAs[String]("text") == "three")
  }

  test("spans break on silence gap > 0.5s, not at 0.5s") {
    val df = utts(
      ("E", 0.0, 1.0, "A", "a"), ("E", 1.5, 2.5, "A", "b"), // gap exactly 0.5 — no break
      ("E", 3.25, 4.5, "A", "c")) // gap 0.75 — break
    val spans = Spans.generate(df).orderBy("start_time").collect()
    assert(spans.map(_.getAs[String]("text")).toSeq == Seq("a b", "c"))
  }

  test("spans under min duration are dropped; positions renumber (spans.py:218)") {
    val df = utts(
      ("E", 0.0, 0.5, "A", "tiny"),         // dropped (0.5s < 1.0s)
      ("E", 10.0, 12.0, "B", "kept"))
    val spans = Spans.generate(df).collect()
    assert(spans.length == 1)
    assert(spans.head.getAs[String]("span_id")
      == graft.core.Ids.spanId("E", 0, "B",
        spans.head.getSeq[String](spans.head.fieldIndex("utterance_ids")), "kept"))
  }

  test("span ids embed sorted utterance ids and text hash") {
    val df = utts(("E", 0.0, 2.0, "A", "x"), ("E", 2.1, 4.0, "A", "y"))
    val s = Spans.generate(df).collect().head
    assert(graft.core.Ids.isValidFormat(s.getAs[String]("span_id"), "span"))
    assert(s.getSeq[String](s.fieldIndex("utterance_ids")).length == 2)
  }

  test("role enrichment defaults and mappings (G2)") {
    val df = utts(("E", 0.0, 2.0, "Dr. X", "x"), ("E", 10.0, 12.0, "Anon", "y"))
    val roles = Map("Dr. X" -> SpeakerRole("Xavier", "expert", isExpert = true))
    val out = Spans.enrichWithRoles(Spans.generate(df), roles)
      .orderBy("start_time").collect()
    assert(out.head.getAs[String]("speaker_canonical") == "Xavier")
    assert(out.head.getAs[Boolean]("is_expert"))
    assert(out(1).getAs[String]("speaker_canonical") == "Anon")
    assert(out(1).getAs[String]("speaker_role") == "other")
    assert(!out(1).getAs[Boolean]("is_expert"))
  }

  // -- beats (G4/G5) ---------------------------------------------------

  private def span(id: String, ep: String, spk: String, s: Double, e: Double,
      expert: Boolean = false, emb: Option[Seq[Float]] = None) =
    SpanForBeats(id, ep, spk, expert, s, e, e - s, s"text-$id", emb)

  test("heuristic beats break on speaker change and >5s gap") {
    val spans = IndexedSeq(
      span("s1", "E", "A", 0, 10), span("s2", "E", "A", 10.5, 20),
      span("s3", "E", "B", 20.5, 30), // speaker change
      span("s4", "E", "B", 40, 50))   // 10s gap
    val b = Beats.boundaries(spans, Beats.Config(useEmbeddings = false))
    assert(b == IndexedSeq(0, 2, 3))
  }

  test("heuristic beats: running duration resets (beats.py:269-275)") {
    // spans of 100s each, same speaker, no gaps: cumulative 100, 200>180 →
    // boundary at i=2 resets, then again after two more spans
    val spans = (0 until 5).map(i =>
      span(s"s$i", "E", "A", i * 100.0, i * 100.0 + 100.0))
    val b = Beats.boundaries(spans, Beats.Config(useEmbeddings = false))
    assert(b == IndexedSeq(0, 2, 4))
  }

  test("semantic beats break where cosine < 0.7 (G3)") {
    val e1 = Some(Seq(1.0f, 0.0f)); val e2 = Some(Seq(0.9f, 0.1f))
    val e3 = Some(Seq(0.0f, 1.0f)) // orthogonal to e2
    val spans = IndexedSeq(
      span("s1", "E", "A", 0, 10, emb = e1), span("s2", "E", "A", 10, 20, emb = e2),
      span("s3", "E", "A", 20, 30, emb = e3))
    val b = Beats.boundaries(spans, Beats.Config())
    assert(b == IndexedSeq(0, 2))
  }

  test("beat assembly: text concat, speakers_set order, expert coverage (A20/E4)") {
    val spans = IndexedSeq(
      span("s1", "E", "B", 0, 10, expert = true),
      span("s2", "E", "A", 10.2, 20)) // would break on speaker; force single beat
    val beats = Beats.assemble("E", spans, IndexedSeq(0), Beats.Config()).toSeq
    assert(beats.length == 1)
    val b = beats.head
    assert(b.text == "text-s1 text-s2")
    assert(b.speakers_set == Seq("B", "A")) // first-occurrence order
    assert(b.expert_span_ids == Seq("s1"))
    assert(b.expert_coverage_pct == 50.0) // 1 of 2 tokens
    assert(graft.core.Ids.isValidFormat(b.beat_id, "beat"))
  }

  test("every span lands in exactly one beat (test_aggregation.py:808 invariant)") {
    val spans = (0 until 50).map(i => span(s"s$i", "E",
      if (i % 7 == 0) "A" else "B", i * 10.0, i * 10.0 + 9.0))
    val ds = spark.createDataset(spans)
    val beats = Beats.generate(ds, Beats.Config(useEmbeddings = false)).collect()
    val assigned = beats.flatMap(_.span_ids)
    assert(assigned.length == 50 && assigned.distinct.length == 50)
  }

  // -- sections (G6) ---------------------------------------------------

  private def beat(id: String, s: Double, e: Double,
      emb: Option[Seq[Float]] = None) =
    BeatForSections(id, "E", s, e, e - s, s"beat-$id", emb)

  test("sections respect min/target/max durations (test_aggregation.py:453)") {
    // 2-minute beats, no gaps, no embeddings: max 12 min is a hard-ish
    // bound only with semantic boundaries absent → overflow allowed never
    // breaks; gap rule never fires; so one section per episode
    val beats = (0 until 10).map(i => beat(s"b$i", i * 120.0, i * 120.0 + 120.0))
    val sections = Sections.pack("E", beats, Sections.Config()).toSeq
    assert(sections.length == 1)
    // with preferTimeBoundaries, breaks at >= 8 min target
    val timed = Sections.pack("E", beats,
      Sections.Config(preferTimeBoundaries = true)).toSeq
    assert(timed.length > 1)
    assert(timed.forall(_.duration_minutes <= 12.0))
  }

  test("sections break on >30s gap once min duration reached") {
    val beats = IndexedSeq(
      beat("b1", 0, 200), beat("b2", 200, 400), // 400s > 300s min
      beat("b3", 440, 500)) // 40s gap
    val sections = Sections.pack("E", beats, Sections.Config()).toSeq
    assert(sections.length == 2)
    assert(sections.head.beat_ids == Seq("b1", "b2"))
  }

  test("strong semantic boundary splits early; weak one waits for 80% target") {
    val a = Some(Seq(1.0f, 0.0f)); val ortho = Some(Seq(0.0f, 1.0f))
    // 460s in (>= min*1.5 = 450s) then orthogonal beat → strong boundary
    val beats = IndexedSeq(
      beat("b1", 0, 230, a), beat("b2", 230, 460, a), beat("b3", 460, 700, ortho))
    val sections = Sections.pack("E", beats, Sections.Config()).toSeq
    assert(sections.length == 2)
    assert(sections.head.beat_ids == Seq("b1", "b2"))
  }

  test("sections chronological, every beat in exactly one section, titles sequential") {
    val beats = (0 until 20).map(i => beat(s"b${"%02d".format(i)}", i * 60.0, i * 60.0 + 55.0))
    val ds = spark.createDataset(beats)
    val sections = Sections.generate(ds, Sections.Config(preferTimeBoundaries = true))
      .collect().sortBy(_.start_time)
    val ids = sections.flatMap(_.beat_ids)
    assert(ids.length == 20 && ids.distinct.length == 20)
    assert(sections.zip(sections.tail).forall { case (x, y) => x.end_time <= y.start_time })
    assert(sections.map(_.title).toSeq == sections.indices.map(i => s"Section ${i + 1}"))
  }

  test("beats degrade per-episode: mixed-coverage episode falls back to heuristic") {
    val e = Some(Seq(1.0f, 0.0f))
    // EP_FULL: all spans embedded, same speaker/no gaps — semantic mode
    // keeps the identical embeddings in ONE beat (heuristic would split
    // at 180s running duration). EP_HALF: 50% coverage — heuristic mode
    // splits on the speaker change at i=1.
    val full = (0 until 3).map(i => SpanForBeats(s"f$i", "EP_FULL", "A", false,
      i * 100.0, i * 100.0 + 100.0, 100.0, s"text-f$i", e))
    val half = IndexedSeq(
      SpanForBeats("h0", "EP_HALF", "A", false, 0, 10, 10, "text-h0", e),
      SpanForBeats("h1", "EP_HALF", "B", false, 10, 20, 10, "text-h1", None))
    val beats = Beats.generate(spark.createDataset(full ++ half), Beats.Config())
      .collect().groupBy(_.episode_id)
    assert(beats("EP_FULL").length == 1)  // semantic: sim = 1.0, no break
    assert(beats("EP_HALF").length == 2)  // heuristic fallback: speaker break
  }

  test("sections coverage gate: <80% embedded beats refuses semantic mode") {
    val e = Some(Seq(1.0f, 0.0f))
    val beats = (0 until 10).map(i => beat(s"b$i", i * 60.0, i * 60.0 + 55.0))
    val beatsDf = spark.createDataset(beats).drop("embedding")
    def embFor(n: Int) = spark.createDataset(
      (0 until n).map(i => (s"b$i", Seq(1.0f, 0.0f)))).toDF("artifact_id", "embedding")
    val gatedCfg = Sections.Config(requireEmbeddings = true)

    // 50% coverage → refused, message names the coverage and the fix
    val err = intercept[IllegalArgumentException] {
      Sections.generateFromDf(beatsDf, Some(embFor(5)), gatedCfg)
    }
    assert(err.getMessage.contains("50.0%") && err.getMessage.contains("requireEmbeddings"))
    // no embeddings at all → refused
    intercept[IllegalArgumentException] {
      Sections.generateFromDf(beatsDf, None, gatedCfg)
    }
    // full coverage → runs in semantic mode
    val ok = Sections.generateFromDf(beatsDf, Some(embFor(10)), gatedCfg).collect()
    assert(ok.flatMap(_.beat_ids).length == 10)
    // ungated (default) still degrades silently at 50%
    val degraded = Sections.generateFromDf(beatsDf, Some(embFor(5))).collect()
    assert(degraded.flatMap(_.beat_ids).length == 10)
  }
}
