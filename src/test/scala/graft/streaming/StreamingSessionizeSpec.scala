package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.StreamingSessionize.Event

class StreamingSessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(user: Long, sec: Long, v: Double = 1.0) =
    Event(user, new Timestamp(sec * 1000), "click", v)

  test("gap sessionization closes sessions via event-time timeout") {
    val input = MemoryStream[Event](spark)
    val sessions = StreamingSessionize.sessions(
      input.toDS().withWatermark("ts", "10 seconds"), gapMs = 5000)
    val q = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // one burst for user 1 (20s,22s,24s) and a lone event for user 2
      // (t=0 would be dropped by the initial watermark, which starts at 0)
      input.addData(ev(1, 20), ev(1, 22, 2.0), ev(1, 24), ev(2, 23))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // watermark hasn't passed

      // far-future event advances the watermark past both open sessions
      input.addData(ev(3, 120))
      q.processAllAvailable()
      // timeout fires on the batch after the watermark update
      input.addData(ev(3, 121))
      q.processAllAvailable()

      val out = spark.table("sess_out")
        .as[StreamingSessionize.Session].collect()
        .map(s => s.user_id -> s).toMap
      assert(out.contains(1L) && out.contains(2L))
      assert(out(1L).n_events == 3 && out(1L).total_value == 4.0)
      assert(out(1L).session_start.getTime == 20000L && out(1L).session_end.getTime == 24000L)
      assert(out(2L).n_events == 1)
    } finally q.stop()
  }

  test("in-batch gap break emits the earlier session immediately") {
    val input = MemoryStream[Event](spark)
    val sessions = StreamingSessionize.sessions(
      input.toDS().withWatermark("ts", "10 seconds"), gapMs = 5000)
    val q = sessions.writeStream
      .format("memory").queryName("sess_out2").outputMode("append").start()
    try {
      // two bursts 30s apart in ONE batch: the first closes in-batch
      input.addData(ev(7, 20), ev(7, 21), ev(7, 50), ev(7, 51))
      q.processAllAvailable()
      val out = spark.table("sess_out2").as[StreamingSessionize.Session].collect()
      assert(out.length == 1)
      assert(out.head.n_events == 2 && out.head.session_end.getTime == 21000L)
    } finally q.stop()
  }

  test("bench streaming phase: deterministic session count, O(users) state, zero drops") {
    // the bench's file-replay harness at 1/100 scale: users x (sessions-1)
    // closed sessions is only reachable if NO batch is watermark-dropped
    // (the mtime-ordering fix) and gaps actually break (the floor fix)
    val s = graft.Bench.streamingThroughput(spark, nRows = 20000L, nUsers = 100)
    assert(s.rows == 20000L)
    // 200 events/user, a >gap jump every 20 => 10 sessions; last stays open
    assert(s.sessions == 100L * 9, s"expected 900 closed sessions, got ${s.sessions}")
    assert(s.stateRows == 100L, s"state must be one open session per user, got ${s.stateRows}")
    assert(s.sessionizeSec > 0 && s.windowSec > 0)
    // latency telemetry: batches actually ran and were measured, and the
    // final watermark trails the global max event time by the configured
    // 2h horizon plus at most one batch's span of event time
    assert(s.batchMsP50 > 0 && s.batchMsP95 >= s.batchMsP50,
      s"batch latency percentiles: p50=${s.batchMsP50} p95=${s.batchMsP95}")
    assert(s.watermarkLagMs >= 2L * 3600 * 1000,
      s"watermark lag must include the 2h horizon, got ${s.watermarkLagMs}")
  }
}
