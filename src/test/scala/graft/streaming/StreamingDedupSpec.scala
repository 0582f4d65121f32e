package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** N4/X107: watermark-bounded streaming dedup. Duplicates inside the
  * horizon are suppressed across micro-batches; the state store retires
  * keys with the watermark (the bounded-state contract that separates
  * this from naive dropDuplicates); a key re-arriving far past the
  * horizon is a NEW row by design (the batch layer owns long-range
  * dedup). */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(id: Long, sec: Long) =
    (id, new Timestamp(sec * 1000), s"text$id")

  test("duplicates within the horizon are suppressed across batches; state retires with the watermark") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val deduped = StreamingDedup.dedupWithinWatermark(
      input.toDF().toDF("doc_id", "ts", "text"),
      "ts", "10 seconds", Seq("doc_id"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(d(1, 20), d(2, 21), d(1, 22)) // in-batch dup of 1
      q.processAllAvailable()
      input.addData(d(1, 23), d(3, 24))           // cross-batch dup of 1
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))

      // advance the watermark far past the horizon (to 200-10=190), then
      // re-deliver 1 at t=195: not watermark-late, but its dedup state
      // expired back at t=33, so the re-delivery is a NEW row by design
      input.addData(d(9, 200))
      q.processAllAvailable()
      input.addData(d(1, 195))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 1L, 2L, 3L, 9L),
        s"expected the past-horizon re-delivery to pass: $ids")

      // bounded state: the store holds only keys inside the live horizon
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty && st.map(_.numRowsTotal).max <= 3,
        s"state must retire with the watermark: ${st.map(_.numRowsTotal).toSeq}")
    } finally q.stop()
  }
}
