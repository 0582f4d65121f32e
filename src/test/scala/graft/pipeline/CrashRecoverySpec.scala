package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ingest.Layout

/** Crash recovery for the composed curate run (VERDICT r11, next-round
  * #8): kill the chain between stage commits, restart with
  * `resume = true`, and prove the restart (a) reuses every committed
  * prefix stage without recomputing it (same single committed version,
  * byte-identical files), (b) recomputes only the unfinished suffix,
  * (c) ignores a half-written uncommitted version a mid-write crash
  * left behind (vacuum reclaims it), and (d) produces accounting
  * identical to an uninterrupted run on the same input. */
class CrashRecoverySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"), col("source"))

  import scala.jdk.CollectionConverters._

  private def fileListing(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p))
      .map(p => root.relativize(p).toString -> java.nio.file.Files.size(p))
      .toMap
    finally s.close()
  }

  test("restart-from-committed-prefix: prefix reused byte-identical, suffix recomputed, junk vacuumed") {
    val base = Files.createTempDirectory("graft_crash").toString

    // crash between the neardup commit and the quality commit
    val e = intercept[IllegalStateException] {
      CuratePipeline.run(spark, docs, base, crashAfterStage = Some("neardup"))
    }
    assert(e.getMessage.contains("simulated crash"))

    // committed prefix = exact + neardup; nothing after exists
    Seq("exact", "neardup").foreach { s =>
      assert(Layout.committedVersions(spark, base, s"curated/$s") == Seq(1),
        s"$s not committed exactly once after the crash")
    }
    Seq("quality", "decontam", "curriculum", "mixture", "shards").foreach { s =>
      assert(Layout.committedVersions(spark, base, s"curated/$s").isEmpty,
        s"$s committed despite the crash")
    }

    // simulate the OTHER crash shape on the next stage: a half-written
    // v1 with no commit marker (mid-write kill)
    val junkDir = Layout.versionedDir(base, "curated/quality", 1)
    docs.limit(3).write.parquet(junkDir)
    assert(!Layout.isCommitted(spark, junkDir))
    assert(Layout.committedVersions(spark, base, "curated/quality").isEmpty)

    val prefixBefore = Seq("exact", "neardup")
      .map(s => s -> fileListing(Layout.versionedDir(base, s"curated/$s", 1)))
      .toMap

    // restart: resumes past the committed prefix, recomputes the rest
    val acc = CuratePipeline.run(spark, docs, base, resume = true)
      .collect().map(r => (r.getAs[String]("stage"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("id_sum"))).toSeq

    // (a) the prefix was REUSED: still exactly one committed version,
    // files byte-identical (names and sizes unchanged)
    Seq("exact", "neardup").foreach { s =>
      assert(Layout.committedVersions(spark, base, s"curated/$s") == Seq(1),
        s"resume recomputed committed prefix stage $s")
      assert(fileListing(Layout.versionedDir(base, s"curated/$s", 1))
        == prefixBefore(s), s"resume rewrote files of prefix stage $s")
    }
    // (b) the suffix was recomputed and committed — quality skipped the
    // junk v1 and landed as v2
    assert(Layout.committedVersions(spark, base, "curated/quality") == Seq(2))
    Seq("decontam", "curriculum", "mixture", "shards").foreach { s =>
      assert(Layout.committedVersions(spark, base, s"curated/$s").nonEmpty,
        s"resume did not complete $s")
    }

    // (c) the junk version stayed invisible and vacuum reclaims it
    val reclaimed = Layout.vacuum(spark, base, "curated/quality", retentionMs = 0L)
    assert(reclaimed.exists(_.endsWith("/v1")),
      s"vacuum did not reclaim the junk version (got $reclaimed)")
    assert(Layout.committedVersions(spark, base, "curated/quality") == Seq(2))

    // (d) accounting identical to an uninterrupted run on the same input
    val cleanBase = Files.createTempDirectory("graft_crash_ref").toString
    val ref = CuratePipeline.run(spark, docs, cleanBase)
      .collect().map(r => (r.getAs[String]("stage"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("id_sum"))).toSeq
    assert(acc == ref, s"resumed accounting diverged:\n$acc\nvs\n$ref")
  }
}
