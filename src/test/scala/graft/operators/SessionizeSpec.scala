package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Mirrors the reference's span-generation tests
  * (tests/test_aggregation.py:186 break-on-speaker-change, gap breaks). */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sessionsOf(rows: Seq[(String, Long, String)]): Map[(String, Long), Long] = {
    val df = rows.toDF("ep", "ts", "speaker")
    Sessionize.withSessions(df, Seq("ep"), "ts", Seq("speaker"), maxGap = 10L,
        changeCols = Seq("speaker"))
      .groupBy("ep", "session_seq").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("breaks on speaker change") {
    val s = sessionsOf(Seq(("e1", 0L, "a"), ("e1", 1L, "a"), ("e1", 2L, "b")))
    assert(s == Map(("e1", 1L) -> 2L, ("e1", 2L) -> 1L))
  }

  test("breaks on gap above threshold, not at threshold") {
    val s = sessionsOf(Seq(("e1", 0L, "a"), ("e1", 10L, "a"), ("e1", 21L, "a")))
    assert(s == Map(("e1", 1L) -> 2L, ("e1", 2L) -> 1L))
  }

  test("partitions are independent") {
    val s = sessionsOf(Seq(("e1", 0L, "a"), ("e2", 0L, "a")))
    assert(s == Map(("e1", 1L) -> 1L, ("e2", 1L) -> 1L))
  }

  test("every row lands in exactly one session") {
    val rows = (0 until 100).map(i => ("e1", i.toLong * 7, if (i % 3 == 0) "a" else "b"))
    assert(sessionsOf(rows).values.sum == 100L)
  }
}
