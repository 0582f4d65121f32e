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
