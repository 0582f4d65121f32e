package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

final case class IngestDoc(doc_id: Long, ts: Timestamp, text: String)

/** N3 content-hash dedup + the streaming quality monitor — the
  * ingest-path specializations of [[StreamingDedup]] (which the X107
  * spec covers as a standalone any-keys operator). */
class StreamingIngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def doc(id: Long, sec: Long, text: String) =
    IngestDoc(id, new Timestamp(sec * 1000), text)

  test("dedupStream: normalized-content duplicates within the horizon are dropped, first wins") {
    val input = MemoryStream[IngestDoc](spark)
    val deduped = StreamingIngest.dedupStream(
      input.toDF(), "ts", "text", watermark = "10 seconds")
    val q = deduped.writeStream
      .format("memory").queryName("ingest_dedup_out").outputMode("append").start()
    try {
      // same normalized content three times (case/whitespace variants),
      // one distinct doc
      input.addData(
        doc(1, 20, "Hello   World"),
        doc(2, 21, "hello world"),
        doc(3, 22, "HELLO\tWORLD"),
        doc(4, 23, "something else"))
      q.processAllAvailable()
      val out = spark.table("ingest_dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 4L)) // first arrival kept
    } finally q.stop()
  }

  test("dedupStream: the same content reappearing across batches within the horizon is dropped") {
    val input = MemoryStream[IngestDoc](spark)
    val deduped = StreamingIngest.dedupStream(
      input.toDF(), "ts", "text", watermark = "1 hour")
    val q = deduped.writeStream
      .format("memory").queryName("ingest_dedup_out2").outputMode("append").start()
    try {
      input.addData(doc(1, 100, "repeated content"))
      q.processAllAvailable()
      input.addData(doc(2, 200, "repeated content"), doc(3, 201, "fresh"))
      q.processAllAvailable()
      val ids = spark.table("ingest_dedup_out2").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("quality monitor reports per-window pass rates") {
    val input = MemoryStream[IngestDoc](spark)
    val mon = StreamingIngest.qualityMonitor(
      input.toDF(), "ts", "text", windowLen = "1 minute", watermark = "10 seconds")
    val q = mon.writeStream
      .format("memory").queryName("ingest_qual_out").outputMode("append").start()
    try {
      val good = ("word " * 60).trim // 60 tokens, no stopwords → high score
      input.addData(
        doc(1, 30, good), doc(2, 40, good), doc(3, 50, "the of and"))
      q.processAllAvailable()
      input.addData(doc(9, 300, good)) // advance watermark past the window
      q.processAllAvailable()
      input.addData(doc(10, 301, good))
      q.processAllAvailable()
      val rows = spark.table("ingest_qual_out")
        .select("n_docs", "n_pass", "pass_rate").collect()
      assert(rows.nonEmpty)
      val first = rows.head
      assert(first.getLong(0) == 3 && first.getLong(1) == 2)
      assert(math.abs(first.getDouble(2) - 2.0 / 3.0) < 1e-9)
    } finally q.stop()
  }
}
