package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The table layer end to end: initial write → merge upsert → CDF diff →
  * Z-order compaction (flattening the chain) → time travel → rollback →
  * vacuum — the interactions, not just the pieces. */
class LakehouseLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("versioned layer survives a full maintenance lifecycle") {
    val base = Files.createTempDirectory("graft_life").toString
    val layer = "normalized"

    // v1: initial partitioned write
    val v1 = (1L to 60L).map(i => (s"ep${i % 3}", i, s"payload-$i"))
      .toDF("episode_id", "row_id", "payload")
    Layout.writeVersioned(v1, base, layer, partitionCols = Seq("episode_id"))
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(20)

    // v2: merge touching one partition + one insert
    Merge.merge(spark, base, layer,
      Seq(("ep1", 1L, "payload-1-v2"), ("ep9", 100L, "fresh"))
        .toDF("episode_id", "row_id", "payload"),
      Seq("row_id"), "episode_id")
    assert(Layout.loadLatest(spark, base, layer).count() == 61)

    // CDF across the merge
    val d = Diff.changes(spark, base, layer, 1, 2, Seq("row_id"))
      .groupBy("_change").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("update" -> 1L, "insert" -> 1L))

    // v3: Z-order compaction flattens the merge chain
    val compactDir = Layout.compact(spark, base, layer,
      targetBytes = 8L * 1024, partitionCols = Seq("episode_id"),
      zOrderCols = Seq("row_id", "payload"))
    assert(Merge.mergeInfo(spark, compactDir).isEmpty)
    assert(Layout.loadLatest(spark, base, layer).count() == 61)

    // diff across merge + compaction: compaction changes no rows
    assert(Diff.changes(spark, base, layer, 2, 3, Seq("row_id")).isEmpty)

    // time travel by version and by timestamp still reach v1
    assert(Layout.loadVersion(spark, base, layer, 1).count() == 60)
    assert(Layout.loadAsOf(spark, base, layer, afterV1).count() == 60)

    // rollback to v2 unpublishes v3; latest is the merged view again
    assert(Layout.rollbackTo(spark, base, layer, 2) == Seq(3))
    val latest = Layout.loadLatest(spark, base, layer)
    assert(latest.filter(col("row_id") === 1L)
      .select("payload").head().getString(0) == "payload-1-v2")

    // vacuum reclaims the unpublished compacted version, never v1
    // (v2's merge chain references it)
    val removed = Layout.vacuum(spark, base, layer, retentionMs = 0L)
    assert(removed.exists(_.endsWith("/v3")))
    assert(Layout.loadLatest(spark, base, layer).count() == 61)
    assert(Layout.loadVersion(spark, base, layer, 1).count() == 60)
  }
}
