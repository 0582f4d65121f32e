package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Mirrors reference ingestion tests (tests/test_ingestion.py patterns):
  * JSONL read with malformed-line tolerance, validation split,
  * normalization ordering/ids, incremental skip. */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def writeJsonl(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_ingest")
    Files.write(dir.resolve(name), String.join("\n", lines: _*).getBytes)
    dir.toString
  }

  private val goodLines = Seq(
    """{"episode_id":"EP1","start":0.0,"end":1.5,"speaker":"A","text":"hello"}""",
    """{"episode_id":"EP1","start":1.6,"end":3.0,"speaker":"A","text":"again"}""",
    """{"episode_id":"EP1","start":3.1,"end":4.0,"speaker":"B","text":"hi"}""")

  test("reads jsonl, keeps malformed lines as error rows (S1/F3)") {
    val dir = writeJsonl("a.jsonl", goodLines :+ "{not json")
    val (valid, errors) = Ingest.validate(
      Ingest.withEpisodeId(Ingest.readJsonl(spark, dir)))
    assert(valid.count() == 3)
    val errTypes = errors.select("error_type").as[String].collect().toSeq
    assert(errTypes == Seq("malformed_json"))
  }

  test("validation rejects bad rows individually with typed errors (F1/F2)") {
    val dir = writeJsonl("b.jsonl", Seq(
      """{"episode_id":"EP1","start":0.0,"end":1.5,"speaker":"A","text":"ok"}""",
      """{"episode_id":"EP1","start":-1.0,"end":1.0,"speaker":"A","text":"neg"}""",
      """{"episode_id":"EP1","start":2.0,"end":1.0,"speaker":"A","text":"inverted"}""",
      """{"episode_id":"EP1","start":3.0,"end":4.0,"speaker":"","text":"nospeaker"}""",
      """{"episode_id":"EP1","start":5.0,"end":6.0,"speaker":"A"}"""))
    val (valid, errors) = Ingest.validate(
      Ingest.withEpisodeId(Ingest.readJsonl(spark, dir)))
    assert(valid.count() == 1)
    val byType = errors.groupBy("error_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("negative_start" -> 1L, "end_not_after_start" -> 1L,
      "empty_speaker" -> 1L, "missing_text" -> 1L))
  }

  test("episode id falls back to file stem (S6)") {
    val dir = writeJsonl("my_episode.jsonl",
      Seq("""{"start":0.0,"end":1.0,"speaker":"A","text":"x"}"""))
    val (valid, _) = Ingest.validate(Ingest.withEpisodeId(Ingest.readJsonl(spark, dir)))
    assert(valid.select("episode_id").as[String].head() == "my_episode")
  }

  test("normalize sorts, numbers positions, computes duration and ids") {
    val dir = writeJsonl("c.jsonl", Seq(
      """{"episode_id":"EP1","start":5.0,"end":6.0,"speaker":"B","text":"second"}""",
      """{"episode_id":"EP1","start":0.0,"end":1.5,"speaker":"A","text":"first"}"""))
    val (valid, _) = Ingest.validate(Ingest.withEpisodeId(Ingest.readJsonl(spark, dir)))
    val norm = Ingest.normalize(valid).orderBy("start").collect()
    assert(norm.map(_.getAs[String]("text")).toSeq == Seq("first", "second"))
    assert(norm.head.getAs[Double]("duration") == 1.5)
    assert(norm.head.getAs[String]("utterance_id")
      == graft.core.Ids.utteranceId("EP1", 0, "first", "A", 0.0, 1.5))
  }

  test("incremental ingest skips existing episodes (N1/J5)") {
    val dir = writeJsonl("d.jsonl", goodLines :+
      """{"episode_id":"EP2","start":0.0,"end":2.0,"speaker":"C","text":"new"}""")
    val existing = Seq("EP1").toDF("episode_id")
    val (norm, _) = Ingest.ingestIncremental(spark, dir, existing)
    assert(norm.select("episode_id").distinct().as[String].collect().toSeq == Seq("EP2"))
  }

  test("pipeline is deterministic across reruns (integration pattern)") {
    val dir = writeJsonl("e.jsonl", goodLines)
    val run1 = Ingest.ingestDirectory(spark, dir)._1.orderBy("start").collect()
    val run2 = Ingest.ingestDirectory(spark, dir)._1.orderBy("start").collect()
    assert(run1.sameElements(run2))
  }
}
