package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

final case class Impression(user_id: Long, imp_ts: Timestamp, ad: String)
final case class Click(user_id: Long, click_ts: Timestamp, target: String)

class StreamingJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def imp(u: Long, sec: Long, ad: String) =
    Impression(u, new Timestamp(sec * 1000), ad)
  private def clk(u: Long, sec: Long, t: String) =
    Click(u, new Timestamp(sec * 1000), t)

  test("clicks join impressions within the window; outside-window ones don't") {
    val imps = MemoryStream[Impression](spark)
    val clicks = MemoryStream[Click](spark)
    val joined = StreamingJoin.intervalJoin(
      imps.toDF(), clicks.toDF(), keyCol = "user_id",
      leftTs = "imp_ts", rightTs = "click_ts",
      before = "0 seconds", after = "30 seconds")
    val q = joined.writeStream
      .format("memory").queryName("attr_out").outputMode("append").start()
    try {
      imps.addData(imp(1, 100, "adA"), imp(2, 100, "adB"))
      clicks.addData(
        clk(1, 110, "hit"),   // 10 s after impression → joins
        clk(2, 200, "late"),  // 100 s after → outside window
        clk(3, 105, "orphan") // no impression for user 3
      )
      q.processAllAvailable()
      val out = spark.table("attr_out")
        .select("user_id", "ad", "target").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(out.toSet == Set((1L, "adA", "hit")))
    } finally q.stop()
  }

  test("overlapping non-key columns are refused up front") {
    val imps = MemoryStream[Impression](spark)
    val e = intercept[IllegalArgumentException] {
      StreamingJoin.intervalJoin(imps.toDF(), imps.toDF(),
        "user_id", "imp_ts", "imp_ts")
    }
    assert(e.getMessage.contains("imp_ts"))
  }
}
