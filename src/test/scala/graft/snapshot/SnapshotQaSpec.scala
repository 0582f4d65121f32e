package graft.snapshot

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Manifest completeness: per-file parquet row counts + parsed QA status
  * (reference: snapshot/manifest.py:139-238, artifacts.py:281-385). */
class SnapshotQaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val greenReport =
    """# Quality Assessment
      |
      |## Executive Summary
      |
      |**Overall Status:** 🟢 **GREEN**
      |
      |**Dataset Overview:**
      |- Episodes: 12
      |- Spans: 1,234
      |- Beats: 567
      |
      |Coverage: 97.5%
      |Duplicate Rate: 0.8%
      |
      |## Details
      |more text
      |""".stripMargin

  test("parseQaReport: GREEN -> PASS with numeric invariants") {
    val qa = Snapshot.parseQaReport(greenReport)
    assert(qa.state == "PASS")
    assert(qa.invariants("episode_count") == 12.0)
    assert(qa.invariants("span_count") == 1234.0)
    assert(qa.invariants("beat_count") == 567.0)
    assert(qa.invariants("coverage_percentage") == 97.5)
    assert(qa.invariants("duplicate_rate") == 0.8)
    assert(qa.provisional)
    assert(qa.summary.nonEmpty && !qa.summary.contains("##"))
  }

  test("parseQaReport: AMBER and RED -> FAIL; no status -> UNKNOWN") {
    assert(Snapshot.parseQaReport("Overall Status: AMBER").state == "FAIL")
    assert(Snapshot.parseQaReport("**Overall Status:** 🔴 **RED**").state == "FAIL")
    val unk = Snapshot.parseQaReport("just some text with the word GREEN in prose")
    assert(unk.state == "UNKNOWN")
  }

  test("create embeds row counts and qa_status; render round-trips both") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap_qa")
    val art = tmp.resolve("artifacts").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .repartition(1).write.parquet(s"$art/rows.parquet")
    java.nio.file.Files.writeString(java.nio.file.Path.of(art, "report.md"), greenReport)

    val m = Snapshot.create(spark, art, tmp.resolve("snap").toString,
      "v1.0.0", "2026-08-12T00:00:00Z")
    val parts = m.files.filter(f => f.path.endsWith(".parquet") && f.rows.isDefined)
    assert(parts.map(_.rows.get).sum == 3L, s"footer rows: ${m.files}")
    assert(m.files.filter(_.path.endsWith(".md")).forall(_.rows.isEmpty))
    assert(m.qa.state == "PASS")
    assert(m.qa.invariants("span_count") == 1234.0)

    val json = Snapshot.renderManifestJson(m)
    assert(json.contains(""""qa_status": {"state": "PASS""""))
    assert(json.contains(""""span_count": 1234"""))
    assert(json.contains(""""rows": 3"""))
    // still validates (manifest fields are additive)
    assert(Snapshot.validate(spark, s"${tmp.resolve("snap")}/v1.0.0", m).isEmpty)
  }

  test("qaStatusFor: no report -> UNKNOWN") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_snap_noqa")
    assert(Snapshot.qaStatusFor(spark, tmp.toString) == Snapshot.UnknownQa)
  }
}
