package graft.ingest

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class DiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("changes between a base version and a merged version are classified") {
    val base = Files.createTempDirectory("graft_diff").toString
    val v1 = Seq(
      ("ep1", 1L, "a"), ("ep1", 2L, "b"),
      ("ep2", 3L, "c"), ("ep3", 4L, "d")).toDF("episode_id", "row_id", "payload")
    Layout.writeVersioned(v1, base, "normalized", partitionCols = Seq("episode_id"))

    Merge.merge(spark, base, "normalized",
      Seq(("ep1", 1L, "a2"), ("ep4", 9L, "new")).toDF("episode_id", "row_id", "payload"),
      Seq("row_id"), "episode_id",
      deleteKeys = Some(Seq(("ep2", 3L)).toDF("episode_id", "row_id")))

    val d = Diff.changes(spark, base, "normalized", 1, 2, keys = Seq("row_id"))
      .collect().map(r => (r.getAs[Long]("row_id"),
        r.getAs[String]("payload"), r.getAs[String]("_change"))).toSet
    assert(d == Set(
      (1L, "a2", "update"),
      (9L, "new", "insert"),
      (3L, "c", "delete")))

    // unchanged rows appear only when asked for
    val all = Diff.changes(spark, base, "normalized", 1, 2, Seq("row_id"),
      includeUnchanged = true)
    assert(all.count() == 5) // 2 ep1 rows + ep2 delete + ep3 unchanged + ep4 insert
    assert(all.filter($"_change" === "unchanged").count() == 2)
  }

  test("identical versions diff to nothing") {
    val base = Files.createTempDirectory("graft_diff2").toString
    val v1 = Seq(("ep1", 1L, "a")).toDF("episode_id", "row_id", "payload")
    Layout.writeVersioned(v1, base, "normalized", partitionCols = Seq("episode_id"))
    Layout.writeVersioned(v1, base, "normalized", partitionCols = Seq("episode_id"))
    assert(Diff.changes(spark, base, "normalized", 1, 2, Seq("row_id")).isEmpty)
  }
}
