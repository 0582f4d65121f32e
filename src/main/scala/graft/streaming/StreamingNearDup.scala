package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** X110: streaming MinHash-LSH near-dup detection with BOUNDED state —
  * the in-flight third of the dedup triad (full batch
  * [[graft.operators.Dedup.minhashNearDups]], incremental batch
  * [[graft.operators.Dedup.incrementalNearDups]], this for documents
  * still on the wire).
  *
  * Per arriving doc: tokenize → distinct shingles → k-slot minhash
  * signature, all map-side with the SAME kernels and affine constants as
  * the batch path (a pair this operator scores gets the identical exact
  * Jaccard the batch pipeline would assign). Each doc then explodes to
  * its `bands` LSH bucket keys — one pass, no streaming self-union — and
  * a [[org.apache.spark.sql.KeyValueGroupedDataset.flatMapGroupsWithState]]
  * keyed on the bucket compares it against the bucket's live members.
  *
  * State is bounded on four axes, which is the whole point:
  *   - horizon: members retire when they fall behind the event-time
  *     watermark (EventTimeTimeout sweeps buckets no batch touches), so
  *     the store is O(docs per horizon), never O(docs ever);
  *   - bucket cap: a bucket at `maxBucket` live members stops admitting
  *     and comparing — the same skip-and-flag contract as the batch
  *     cap ([[graft.operators.Dedup.candidatePairs]]), because a
  *     boilerplate bucket on a crawl stream is quadratic by
  *     construction. Saturation latches for the bucket-horizon: once
  *     saturated the bucket admits and emits nothing until its live
  *     members expire with the watermark, so a hot bucket degrades
  *     deterministically instead of quadratically;
  *   - member payload: each live member stores at most `maxStoredHashes`
  *     of its sorted shingle hashes — the ASCENDING-sorted array's prefix
  *     is a bottom-k (KMV) sketch, so a member costs ≤ 8·maxStoredHashes
  *     + ~32 bytes per band REGARDLESS of document length. Pairs where
  *     both sides fit under the cap score the batch pipeline's EXACT
  *     jaccard (`exact = true`); a truncated side downgrades the score to
  *     the standard KMV estimate (matches / union-size below the smaller
  *     truncation threshold, std-err ≈ √(j(1−j)/maxStoredHashes)) and the
  *     emitted row says so (`exact = false`);
  *   - re-delivery: a doc id already live in the bucket is dropped
  *     (at-least-once upstreams re-deliver within the horizon — the
  *     streaming sibling of [[StreamingDedup.dedupWithinWatermark]]).
  *
  * A pair sharing multiple bands is emitted once PER SHARED BAND (rows
  * carry `band_id`): distinct-across-groups inside the stream would need
  * a second stateful stage, which Spark disallows after
  * flatMapGroupsWithState — dedup at the sink on (id_a, id_b), e.g. the
  * N2 foreachBatch MERGE pattern. Long-range duplicates (past the
  * horizon) are the batch layer's job, same division of labor as X107.
  *
  * Output: (id_a, id_b, jac, exact, band_id, ts) in append mode, ts =
  * the later doc's event time. */
object StreamingNearDup {

  /** One live bucket member: doc id, ascending-sorted 64-bit shingle
    * hashes CAPPED at maxStoredHashes (a bottom-k sketch when truncated),
    * TRUE shingle-set size, event-time millis. Truncation is derivable:
    * hsh.length < sz. In-memory working shape only — the persisted state
    * is the flat [[BucketState]]. */
  final case class BucketDoc(id: Long, hsh: Array[Long], sz: Int, tsMs: Long)

  /** Bucket state, FLAT: one primitive array per member field plus the
    * member hash payloads flattened behind an offsets array, and the
    * saturation latch. Member i is (ids(i), szs(i), tsMs(i),
    * hshFlat[hshOff(i) until hshOff(i+1))).
    *
    * Flat primitive arrays, not a List[BucketDoc] (r16): Spark's state
    * encoder turns a List of case classes into a per-element
    * object-serializer walk (alloc + nested array copy per member per
    * state put), while primitive arrays encode as single bulk copies —
    * and the stateful operator puts ~3 band rows per arriving doc, which
    * made the encoder the dominant per-doc cost of the whole stream
    * (state side ≈ 1.2 s of each 1.7 s 50k-doc micro-batch). Same
    * logical content, same caps, same emitted pairs. */
  final case class BucketState(ids: Array[Long], szs: Array[Int],
      tsMs: Array[Long], hshOff: Array[Int], hshFlat: Array[Long],
      saturated: Boolean)

  private def toState(docs: List[BucketDoc], saturated: Boolean): BucketState = {
    val n = docs.length
    val ids = new Array[Long](n); val szs = new Array[Int](n)
    val ts = new Array[Long](n); val off = new Array[Int](n + 1)
    var i = 0
    var it = docs
    while (it.nonEmpty) {
      val d = it.head
      ids(i) = d.id; szs(i) = d.sz; ts(i) = d.tsMs
      off(i + 1) = off(i) + d.hsh.length
      i += 1; it = it.tail
    }
    val flat = new Array[Long](off(n))
    i = 0; it = docs
    while (it.nonEmpty) {
      val d = it.head
      System.arraycopy(d.hsh, 0, flat, off(i), d.hsh.length)
      i += 1; it = it.tail
    }
    BucketState(ids, szs, ts, off, flat, saturated)
  }

  private def fromState(s: BucketState): List[BucketDoc] = {
    var out: List[BucketDoc] = Nil
    var i = s.ids.length - 1
    while (i >= 0) {
      out = BucketDoc(s.ids(i),
        java.util.Arrays.copyOfRange(s.hshFlat, s.hshOff(i), s.hshOff(i + 1)),
        s.szs(i), s.tsMs(i)) :: out
      i -= 1
    }
    out
  }

  final case class StreamPair(id_a: Long, id_b: Long, jac: Double,
      exact: Boolean, band_id: Int, ts: Timestamp)

  /** Internal row shape between the band explode and the stateful
    * operator (public only because encoder codegen must reach it).
    * `bandKey` is xxhash64 of the batch path's string band key (r16):
    * the 64-bit key shuffles and stores at a third of the string key's
    * bytes and hashes/compares in O(1) in the state map. Two DIFFERENT
    * band signatures sharing a key takes an xxhash64 collision
    * (~n²/2⁶⁴ per band-horizon); the only effect would be one merged
    * candidate bucket, whose extra pairs still verify through the same
    * exact/KMV Jaccard before emission and whose cap accounting merges —
    * the same measure-zero hash-equality device the batch decontam/q27
    * paths document. */
  final case class BandRow(bandId: Int, bandKey: Long, id: Long,
      hsh: Array[Long], sz: Int, ts: Timestamp)

  /** Jaccard over two ascending-sorted hash prefixes of sets with true
    * sizes aSz/bSz. When neither side is truncated this is the EXACT
    * |∩| / |∪| the batch pipeline computes (bit-identical division: the
    * merge's union count equals aSz + bSz − matches). When a side is
    * truncated, the score is the standard bottom-k (KMV) estimate: only
    * hashes at or below the smaller truncation threshold τ are visible
    * COMPLETELY on both sides (a sorted prefix holds every set element
    * ≤ its last value), so matches/union over that slice is an unbiased
    * jaccard estimator over a uniform-hash subsample. Returns
    * (jac, exact). */
  private[streaming] def jaccardBottomK(a: Array[Long], aSz: Int,
      b: Array[Long], bSz: Int): (Double, Boolean) = {
    val aTrunc = a.length < aSz
    val bTrunc = b.length < bSz
    val tau =
      if (!aTrunc && !bTrunc) Long.MaxValue
      else math.min(if (aTrunc) a(a.length - 1) else Long.MaxValue,
        if (bTrunc) b(b.length - 1) else Long.MaxValue)
    var i = 0; var j = 0; var m = 0; var u = 0
    var done = false
    while (!done) {
      val av = if (i < a.length) a(i) else Long.MaxValue
      val bv = if (j < b.length) b(j) else Long.MaxValue
      if ((i >= a.length && j >= b.length) || math.min(av, bv) > tau) done = true
      else {
        u += 1
        if (av == bv) { m += 1; i += 1; j += 1 }
        else if (av < bv) i += 1
        else j += 1
      }
    }
    (if (u == 0) 0.0 else m.toDouble / u, !aTrunc && !bTrunc)
  }

  /** Default per-member stored-hash cap: 8 KB of longs per member per
    * band. KMV std-err ≈ √(j(1−j)/1024) ≈ 0.016 at j = 0.5 — well inside
    * the margin any near-dup threshold tolerates — and documents under
    * 1024 distinct shingles (the overwhelming mass of a chunked corpus)
    * still score EXACT jaccard. */
  val DefaultMaxStoredHashes: Int = 1024

  /** Near-dup pairs over a streaming (id, text, event-time) frame.
    * `delayMs` is both the watermark delay and the dedup horizon. */
  def streamingNearDups(docs: DataFrame, idCol: String, textCol: Column,
      tsCol: String, delayMs: Long, shingleWords: Int, k: Int, bands: Int,
      threshold: Double,
      maxBucket: Int = Dedup.DefaultMaxBucket,
      maxStoredHashes: Int = DefaultMaxStoredHashes): Dataset[StreamPair] = {
    require(k % bands == 0, "k must divide into equal bands")
    require(delayMs > 0, "delayMs must be positive")
    require(maxStoredHashes > 0,
      "maxStoredHashes must be positive (a non-positive cap would slice " +
        "every stored sketch empty and crash jaccardBottomK at runtime)")
    val r = k / bands
    val spark = docs.sparkSession
    import spark.implicits._

    val marked = docs.withWatermark(tsCol, s"$delayMs milliseconds")
    // single-pass shingle → signature → band explode, keeping ts inline
    // (the batch path's shingleSets/indexColumns drop extra columns; the
    // expressions, kernels, and affine constants here are the same)
    graft.expressions.HashFunctions.register(spark)
    graft.expressions.TextExprs.register(spark)
    graft.expressions.HashFunctions.registerMinhash(spark, s"graft_minhash_$k",
      (0 until k).map(Dedup.affineA).toArray, (0 until k).map(Dedup.affineB).toArray)
    val shingled = marked
      .select(col(idCol), col(tsCol), graft.functions.TextFunctions.tokens(textCol).as("tk"))
      .select(col(idCol), col(tsCol),
        (if (shingleWords <= 1) array_distinct(col("tk"))
         else graft.expressions.TextExprs.distinct_word_ngrams(col("tk"), shingleWords)).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("hs", graft.expressions.HashFunctions.poly_hash_array(col("sh")))
      .withColumn("sig", call_function(s"graft_minhash_$k", col("hs")))
      // the stored payload caps at maxStoredHashes: the ascending-sorted
      // array's PREFIX is a bottom-k sketch, so the slice is the sketch
      .withColumn("hsh", slice(
        graft.expressions.TextExprs.xx_sorted_hash(col("sh")), 1, maxStoredHashes))
      .withColumn("sz", size(col("sh")))
    val banded = shingled
      .withColumn("band", explode(array((0 until bands).map { b =>
        struct(lit(b).as("band_id"),
          xxhash64(concat_ws(",", (0 until r).map(i =>
            get(col("sig"), lit(b * r + i))): _*)).as("band_key"))
      }: _*)))
      // the event-time column must survive AS A TIMESTAMP into the
      // stateful operator's input: EventTimeTimeout requires the
      // watermark-tagged column there (casting it to long millis fails
      // analysis — measured r16, not folklore)
      .select(col("band.band_id").as("bandId"), col("band.band_key").as("bandKey"),
        col(idCol).as("id"), col("hsh"), col("sz"), col(tsCol).as("ts"))
      .as[BandRow]

    banded
      .groupByKey(row => (row.bandId, row.bandKey))
      .flatMapGroupsWithState[BucketState, StreamPair](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, Long), rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            // horizon sweep for buckets this batch never touched
            val prev = state.get
            val live = fromState(prev).filter(_.tsMs >= wm)
            if (live.isEmpty) state.remove()
            else {
              state.update(toState(live, prev.saturated))
              state.setTimeoutTimestamp(math.max(
                live.map(_.tsMs).max + delayMs, wm + 1))
            }
            Iterator.empty
          } else {
            val prev = state.getOption
            // expired members retire before any comparison
            var members = prev.map(fromState).getOrElse(Nil).filter(_.tsMs >= wm)
            var saturated = prev.exists(_.saturated) && members.nonEmpty
            val out = List.newBuilder[StreamPair]
            // deterministic within-batch order: event time, then id
            val sorted = rows.toArray
            java.util.Arrays.sort(sorted, new java.util.Comparator[BandRow] {
              def compare(x: BandRow, y: BandRow): Int = {
                val c = java.lang.Long.compare(x.ts.getTime, y.ts.getTime)
                if (c != 0) c else java.lang.Long.compare(x.id, y.id)
              }
            })
            for (row <- sorted) {
              val dup = members.exists(_.id == row.id)
              if (!dup && !saturated) {
                if (members.sizeIs >= maxBucket) {
                  // skip-and-flag: past the cap the bucket stops scoring
                  // entirely (the batch cap's semantics) until its
                  // members expire with the horizon
                  saturated = true
                } else {
                  val tMs = row.ts.getTime
                  for (m <- members) {
                    // exact size bound on TRUE set sizes, same as the
                    // batch verify — valid whether or not payloads are
                    // truncated
                    if (math.min(m.sz, row.sz) >= threshold * math.max(m.sz, row.sz)) {
                      val (jac, isExact) =
                        jaccardBottomK(m.hsh, m.sz, row.hsh, row.sz)
                      if (jac >= threshold)
                        out += StreamPair(math.min(m.id, row.id), math.max(m.id, row.id),
                          jac, isExact, key._1, new Timestamp(math.max(m.tsMs, tMs)))
                    }
                  }
                  members = BucketDoc(row.id, row.hsh, row.sz, tMs) :: members
                }
              }
            }
            if (members.isEmpty) { state.remove(); out.result().iterator }
            else {
              state.update(toState(members, saturated))
              state.setTimeoutTimestamp(math.max(
                members.map(_.tsMs).max + delayMs, wm + 1))
              out.result().iterator
            }
          }
      }
  }
}
