package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.Dedup

/** X110 streaming near-dup: cross-batch pairs found at the batch
  * pipeline's exact Jaccard, state bounded by horizon + bucket cap,
  * in-horizon re-deliveries suppressed, past-horizon members retired. */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"
  private val nearDup = base.replace("quiet", "busy")
  private val unrelated =
    "completely different content about databases indexes and storage engines at scale"

  private def doc(id: Long, sec: Long, text: String) =
    (id, new Timestamp(sec * 1000), text)

  private def startQuery(input: MemoryStream[(Long, Timestamp, String)],
      name: String, cap: Int = Dedup.DefaultMaxBucket) = {
    val pairs = StreamingNearDup.streamingNearDups(
      input.toDF().toDF("doc_id", "ts", "text"),
      "doc_id", col("text"), "ts", delayMs = 10000L,
      shingleWords = 2, k = 12, bands = 4, threshold = 0.5, maxBucket = cap)
    pairs.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
  }

  private def pairsOf(name: String): Set[(Long, Long, Double)] =
    spark.table(name).select("id_a", "id_b", "jac").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("cross-batch near-dup found at the batch pipeline's exact jaccard; unrelated and stale docs are not paired") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = startQuery(input, "snd_out")
    try {
      input.addData(doc(1, 20, base), doc(2, 21, unrelated))
      q.processAllAvailable()
      assert(pairsOf("snd_out").isEmpty)
      // arrives 4 s after doc 1 — inside the 10 s horizon
      input.addData(doc(3, 24, nearDup))
      q.processAllAvailable()
      val found = pairsOf("snd_out")
      assert(found.map(p => (p._1, p._2)) == Set((1L, 3L)), s"got $found")
      // the streamed jac must equal the batch pipeline's exact value
      val batchJac = Dedup.minhashNearDups(
          Seq((1L, base), (3L, nearDup)).toDF("doc_id", "text"),
          "doc_id", col("text"), shingleWords = 2, k = 12, bands = 4,
          threshold = 0.5)
        .collect().head.getAs[Double]("jac")
      assert(found.head._3 == batchJac,
        s"stream jac ${found.head._3} != batch jac $batchJac")

      // push the watermark far ahead (t=100 -> wm=90): docs 1-3 retire.
      // a near-dup of doc 1 arriving later must NOT pair with it (doc 9
      // shares no vocabulary with anything — it only moves the watermark;
      // note the watermark lags one batch, so it must ride its own batch)
      input.addData(doc(9, 100,
        "zebra yankee xray whiskey victor uniform tango sierra romeo quebec papa"))
      q.processAllAvailable()
      input.addData(doc(10, 95, base.replace("rain", "snow")))
      q.processAllAvailable()
      assert(pairsOf("snd_out").map(p => (p._1, p._2)) == Set((1L, 3L)),
        "past-horizon member must not pair with a late near-dup")

      // bounded state: only in-horizon members remain in the store
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty, "state operator telemetry missing")
    } finally q.stop()
  }

  test("in-horizon re-delivery of the same doc id is suppressed (no self-pair, no double member)") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = startQuery(input, "snd_redeliver")
    try {
      input.addData(doc(1, 20, base))
      q.processAllAvailable()
      input.addData(doc(1, 22, base)) // at-least-once re-delivery
      q.processAllAvailable()
      assert(pairsOf("snd_redeliver").isEmpty, "re-delivery must not self-pair")
      input.addData(doc(2, 24, nearDup))
      q.processAllAvailable()
      // exactly one (1,2) pair per shared band — not doubled by the
      // re-delivered copy of doc 1
      val rows = spark.table("snd_redeliver")
        .groupBy("id_a", "id_b", "band_id").count()
        .collect()
      assert(rows.nonEmpty && rows.forall(_.getLong(3) == 1L),
        s"re-delivered member doubled a pair: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("bucket cap: a saturated bucket stops scoring (skip-and-flag) but honest buckets keep working") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = startQuery(input, "snd_cap", cap = 3)
    try {
      // 5 verbatim copies: members 100-102 admitted (<=3), then the
      // bucket saturates; pairs among the first 3 emit, nothing after
      input.addData((100L to 104L).map(i => doc(i, 20 + (i - 100), base)): _*)
      q.processAllAvailable()
      val afterFamily = pairsOf("snd_cap")
      assert(afterFamily.map(p => (p._1, p._2)) ==
        Set((100L, 101L), (100L, 102L), (101L, 102L)),
        s"expected exactly the pre-saturation pairs: $afterFamily")
      // saturation latched: a 6th copy inside the horizon emits nothing
      input.addData(doc(105, 26, base))
      q.processAllAvailable()
      assert(pairsOf("snd_cap").size == 3)
      // an unrelated bucket is unaffected
      input.addData(doc(200, 27, unrelated), doc(201, 28, unrelated))
      q.processAllAvailable()
      assert(pairsOf("snd_cap").map(p => (p._1, p._2)).contains((200L, 201L)))
    } finally q.stop()
  }
}
