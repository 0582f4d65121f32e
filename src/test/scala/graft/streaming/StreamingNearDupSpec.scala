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

  test("jaccardBottomK: exact (bit-identical to the batch formula) when untruncated, unbiased KMV estimate when capped") {
    val rnd = new scala.util.Random(42)
    def randSet(n: Int): Array[Long] = {
      val s = scala.collection.mutable.SortedSet[Long]()
      while (s.size < n) s += rnd.nextLong()
      s.toArray
    }
    // 2000-element sets with ~60% true overlap
    val shared = randSet(1200)
    val a = (shared ++ randSet(800)).distinct.sorted
    val b = (shared ++ randSet(800)).distinct.sorted
    val inter = a.intersect(b).length
    val trueJac = inter.toDouble / (a.length + b.length - inter)

    // untruncated: EXACT, same division as the batch pipeline
    val (exactJac, exactFlag) = StreamingNearDup.jaccardBottomK(a, a.length, b, b.length)
    assert(exactFlag)
    assert(exactJac == inter.toDouble / (a.length + b.length - inter))

    // capped to 256 stored hashes per side: the flag drops, the KMV
    // estimate stays within ~5 std-errs (√(j(1−j)/256) ≈ 0.031)
    val cap = 256
    val (estJac, estFlag) =
      StreamingNearDup.jaccardBottomK(a.take(cap), a.length, b.take(cap), b.length)
    assert(!estFlag)
    assert(math.abs(estJac - trueJac) < 0.16,
      s"KMV estimate $estJac vs true $trueJac")

    // one-sided truncation also downgrades the flag and stays close
    val (oneJac, oneFlag) =
      StreamingNearDup.jaccardBottomK(a.take(cap), a.length, b, b.length)
    assert(!oneFlag)
    assert(math.abs(oneJac - trueJac) < 0.16, s"one-sided $oneJac vs true $trueJac")
  }

  test("member payload is bounded: capped stream state is a fraction of uncapped on long documents, pairs flagged estimated") {
    // 8 docs × ~3000 distinct bigrams each, in two verbatim-duplicate
    // families — long enough that the stored-hash cap dominates state
    def longText(fam: Int): String =
      (0 until 3000).map(i => s"w${fam}_${i * 2654435761L % 99991}").mkString(" ")
    def run(name: String, cap: Int): (Long, Set[(Long, Long, Boolean)]) = {
      val input = MemoryStream[(Long, Timestamp, String)](spark)
      val pairs = StreamingNearDup.streamingNearDups(
        input.toDF().toDF("doc_id", "ts", "text"),
        "doc_id", col("text"), "ts", delayMs = 10000L,
        shingleWords = 2, k = 12, bands = 4, threshold = 0.5,
        maxStoredHashes = cap)
      val q = pairs.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        input.addData((0L until 8L).map(i => doc(i, 20 + i, longText((i % 2).toInt))): _*)
        q.processAllAvailable()
        val st = q.lastProgress.stateOperators
        val bytes = if (st.isEmpty) 0L else st.map(_.memoryUsedBytes).max
        val got = spark.table(name).select("id_a", "id_b", "exact").distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
        (bytes, got)
      } finally q.stop()
    }
    val (cappedBytes, cappedPairs) = run("snd_capped", 64)
    val (fullBytes, fullPairs) = run("snd_full", Int.MaxValue)
    // verbatim duplicates within each family: same shingle set → KMV
    // prefix identical → estimate 1.0, so the same pairs emerge, but
    // flagged estimated under the cap and exact without it
    assert(cappedPairs.map(p => (p._1, p._2)) == fullPairs.map(p => (p._1, p._2)),
      s"capped $cappedPairs vs full $fullPairs")
    assert(cappedPairs.nonEmpty && cappedPairs.forall(!_._3), "capped pairs must be flagged estimated")
    assert(fullPairs.forall(_._3), "uncapped pairs on full payloads must be exact")
    // the bytes-per-member bound: 64 stored longs ≪ 3000 — state shrinks
    // by at least 5× (3000/64 ≈ 47× on payload alone; overhead dilutes)
    assert(cappedBytes * 5 < fullBytes,
      s"capped state $cappedBytes bytes vs uncapped $fullBytes — cap not bounding")
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
