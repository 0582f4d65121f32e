package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

final case class DedupDoc(doc_id: Long, ts: Timestamp, text: String)

class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def doc(id: Long, sec: Long, text: String) =
    DedupDoc(id, new Timestamp(sec * 1000), text)

  test("duplicates within the watermark horizon are dropped, first wins") {
    val input = MemoryStream[DedupDoc](spark)
    val deduped = StreamingIngest.dedupStream(
      input.toDF(), "ts", "text", watermark = "10 seconds")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      // same normalized content three times (case/whitespace variants),
      // one distinct doc
      input.addData(
        doc(1, 20, "Hello   World"),
        doc(2, 21, "hello world"),
        doc(3, 22, "HELLO\tWORLD"),
        doc(4, 23, "something else"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").as[DedupDoc].collect()
      assert(out.length == 2)
      assert(out.map(_.doc_id).toSet == Set(1L, 4L)) // first arrival kept
    } finally q.stop()
  }

  test("quality monitor reports per-window pass rates") {
    val input = MemoryStream[DedupDoc](spark)
    val mon = StreamingIngest.qualityMonitor(
      input.toDF(), "ts", "text", windowLen = "1 minute", watermark = "10 seconds")
    val q = mon.writeStream
      .format("memory").queryName("qual_out").outputMode("append").start()
    try {
      val good = ("word " * 60).trim // 60 tokens, no stopwords → high score
      input.addData(
        doc(1, 30, good), doc(2, 40, good), doc(3, 50, "the of and"))
      q.processAllAvailable()
      input.addData(doc(9, 300, good)) // advance watermark past the window
      q.processAllAvailable()
      input.addData(doc(10, 301, good))
      q.processAllAvailable()
      val rows = spark.table("qual_out")
        .select("n_docs", "n_pass", "pass_rate").collect()
      assert(rows.nonEmpty)
      val first = rows.head
      assert(first.getLong(0) == 3 && first.getLong(1) == 2)
      assert(math.abs(first.getDouble(2) - 2.0 / 3.0) < 1e-9)
    } finally q.stop()
  }

  test("the same content reappearing across batches within the horizon is dropped") {
    val input = MemoryStream[DedupDoc](spark)
    val deduped = StreamingIngest.dedupStream(
      input.toDF(), "ts", "text", watermark = "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("dedup_out2").outputMode("append").start()
    try {
      input.addData(doc(1, 100, "repeated content"))
      q.processAllAvailable()
      input.addData(doc(2, 200, "repeated content"), doc(3, 201, "fresh"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out2").as[DedupDoc].collect().map(_.doc_id).toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }
}
