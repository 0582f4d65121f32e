package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val edges = Seq(0.0, 10.0, 25.0, 50.0, 100.0, 200.0)
  private def ts(m: Int) = new Timestamp(3600L * 1000 + m * 60000L)

  test("a window distributed like the baseline scores 0; a shifted one alarms") {
    // baseline for key "k": half the mass in bin 0 (value 5), half in bin 2 (30)
    val base = Seq(("k", 5.0), ("k", 5.0), ("k", 30.0), ("k", 30.0)).toDF("key", "value")
    val profile = StreamingDrift.baselineProfile(base, "key", "value", edges)

    val input = MemoryStream[(Timestamp, String, Double)](spark)
    // window 1 (minutes 0-9): same shape as baseline -> psi = 0 exactly
    input.addData((ts(0), "k", 5.0), (ts(1), "k", 5.0), (ts(2), "k", 30.0), (ts(3), "k", 30.0))
    // window 2 (minutes 10-19): all mass in bin 4 (150) -> drift
    input.addData((ts(10), "k", 150.0), (ts(11), "k", 150.0), (ts(12), "k", 150.0), (ts(13), "k", 150.0))

    val out = StreamingDrift.psiMonitor(
      input.toDF().toDF("ts", "key", "value"), "ts", "key", "value",
      profile, edges, "10 minutes", "0 seconds")
    val q = out.writeStream.format("memory").queryName("drift")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("drift")
        .select("window.start", "n", "psi").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2)))
        .sortBy(_._1)
      assert(rows.length == 2, s"expected two windows: ${rows.toSeq}")
      assert(rows(0)._2 == 4L && rows(0)._3 == 0.0,
        s"baseline-shaped window must score exactly 0: ${rows.toSeq}")
      assert(rows(1)._2 == 4L && rows(1)._3 > 1.0,
        s"fully shifted window must alarm: ${rows.toSeq}")
    } finally q.stop()
  }

  test("the same plan runs in batch for backfill parity") {
    val base = Seq(("k", 5.0), ("k", 30.0)).toDF("key", "value")
    val profile = StreamingDrift.baselineProfile(base, "key", "value", edges)
    val batch = Seq((ts(0), "k", 5.0), (ts(1), "k", 30.0))
      .toDF("ts", "key", "value")
    val rows = StreamingDrift.psiMonitor(batch, "ts", "key", "value",
      profile, edges, "10 minutes", "0 seconds")
      .select("n", "psi").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((2L, 0.0)))
  }

  test("a key absent from the baseline alarms instead of emitting null psi") {
    val base = Seq(("k", 5.0), ("k", 30.0)).toDF("key", "value")
    val profile = StreamingDrift.baselineProfile(base, "key", "value", edges)
    // "brandnew" never appeared in the baseline — the strongest drift
    // signal; its shares score against the smoothed empty profile (1/B
    // per bin), producing a large FINITE psi, not null
    val batch = Seq(
      (ts(0), "brandnew", 150.0), (ts(1), "brandnew", 150.0),
      (ts(2), "brandnew", 150.0), (ts(3), "brandnew", 150.0))
      .toDF("ts", "key", "value")
    val rows = StreamingDrift.psiMonitor(batch, "ts", "key", "value",
      profile, edges, "10 minutes", "0 seconds")
      .select("key", "n", "psi").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.length == 1)
    val (key, n, psi) = rows.head
    assert(key == "brandnew" && n == 4L)
    assert(psi.isDefined, "unseen key emitted null psi — it must alarm")
    // all mass in one bin vs uniform 1/B: smoothed current shares are
    // (4+0.5)/(4+3) hot and (0+0.5)/(4+3) cold, baseline floor 1/6
    val b = 6
    val expect = {
      val pHot = 4.5 / 7; val pCold = 0.5 / 7; val pb = 1.0 / b
      val hot = (pHot - pb) * math.log(pHot / pb)
      val cold = (b - 1) * ((pCold - pb) * math.log(pCold / pb))
      BigDecimal(hot + cold).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(psi.get - expect) < 1e-6, s"psi=${psi.get} expect=$expect")
  }
}
