package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Partition-local exact top-k scoring kernel behind
  * [[Similarity.topKExact]] (r16).
  *
  * Replaces the |Q|·n broadcast-nested-loop join + full-stream heap agg
  * with a tight per-task loop over primitive arrays: each corpus
  * partition scores its rows against every (collected, bounded) query
  * and keeps only the top-k candidates per query under the SAME total
  * order [[Similarity.perQueryTopK]] uses — rounded sim desc with NaN
  * first and null last, ties on ascending neighbor id (UTF8 byte order
  * for strings, i.e. Spark's own string ordering). Merging per-partition
  * top-k supersets through the unchanged final agg therefore reproduces
  * the join formulation's output EXACTLY (spec-pinned):
  *
  *  - dot products accumulate in ascending index order over
  *    min(|a|,|b|) elements — the [[graft.expressions.VecDotD]] loop;
  *  - sim = dot / (qn · nn), then HALF_UP rounding via
  *    BigDecimal.valueOf — the Round expression's double path (NaN and
  *    infinities pass through unrounded, as Round does);
  *  - rows with a NULL vector keep join semantics: their sim is null and
  *    ranks last, so each partition forwards its k+1 smallest null-vector
  *    ids (superset of anything the global top-k could admit);
  *  - rows whose id equals the query's are skipped (the join condition).
  *
  * One documented divergence: a ZERO-norm vector makes the ANSI join
  * formulation throw DIVIDE_BY_ZERO (0.0 divisor), while this kernel's
  * scalar division yields NaN (ranked first, like any NaN sim). No
  * declared query or bench corpus produces zero-norm vectors — the
  * oracle pins that — so the divergence is unreachable there; where it
  * would be reached, a result beats an engine error.
  *
  * A cheap pre-round reject (raw sim more than half an ulp-of-scale
  * below the current worst kept key) skips the BigDecimal allocation for
  * the overwhelming majority of pairs.
  */
private[operators] object TopKKernel {

  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Spark Round(double, dp) exactly: NaN/Inf pass through, else
    * BigDecimal.valueOf (Double.toString semantics) + HALF_UP. */
  private def roundLike(x: Double, dp: Int): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else JBigDecimal.valueOf(x).setScale(dp, RoundingMode.HALF_UP).doubleValue()

  /** corpus: (neighbor_id, nv array<double>); qRows: collected
    * (query_id, qv) rows, none null. Returns (query_id, neighbor_id,
    * sim) candidate rows — ≤ (k + k+1)·|Q| per partition — for
    * [[Similarity.perQueryTopK]]. Id types must both be string or both
    * be integral (caller-checked). */
  def partitionTopK(corpus: DataFrame, qRows: Array[Row],
      qIdType: DataType, nIdType: DataType, k: Int, roundDp: Int): DataFrame = {
    val spark = corpus.sparkSession
    val stringIds = qIdType == StringType
    val eQIds: Array[AnyRef] = qRows.map(_.get(0).asInstanceOf[AnyRef])
    val qVecs: Array[Array[Double]] = qRows.map(_.getSeq[Double](1).toArray)
    val qNorms: Array[Double] = qVecs.map { v =>
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i) * v(i); i += 1 }
      math.sqrt(acc)
    }
    val bQIds = spark.sparkContext.broadcast(eQIds)
    val bVecs = spark.sparkContext.broadcast(qVecs)
    val bNorms = spark.sparkContext.broadcast(qNorms)
    val outSchema = StructType(Seq(
      StructField("query_id", qIdType, nullable = true),
      StructField("neighbor_id", nIdType, nullable = true),
      StructField("sim", DoubleType, nullable = true)))
    // round(x) can exceed x by at most half an ulp-of-scale; anything
    // further below the current worst kept key cannot enter the heap
    val rejectMargin = math.pow(10.0, -roundDp)

    val out = corpus.mapPartitions { it =>
      val qIds = bQIds.value
      val vecs = bVecs.value
      val norms = bNorms.value
      val nQ = qIds.length

      def cmpId(a: AnyRef, b: AnyRef): Int =
        if (stringIds) utf8Cmp(a.asInstanceOf[String], b.asInstanceOf[String])
        else java.lang.Long.compare(a.asInstanceOf[Number].longValue(),
          b.asInstanceOf[Number].longValue())
      def idEq(a: AnyRef, b: AnyRef): Boolean =
        if (stringIds) a == b
        else a.asInstanceOf[Number].longValue() == b.asInstanceOf[Number].longValue()
      // heap root = WORST kept candidate: smallest key, ties LARGEST id
      def worse(ka: Double, ia: AnyRef, kb: Double, ib: AnyRef): Boolean =
        ka < kb || (ka == kb && cmpId(ia, ib) > 0)

      // per-query bounded min-heaps (root = worst kept)
      val sizes = new Array[Int](nQ)
      val keys = Array.fill(nQ)(new Array[Double](k))
      val hIds = Array.fill(nQ)(new Array[AnyRef](k))
      val hSims = Array.fill(nQ)(new Array[java.lang.Double](k))
      def siftDown(q: Int): Unit = {
        val ks = keys(q); val ids = hIds(q); val ss = hSims(q); val n = sizes(q)
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1; val r = l + 1
          var w = i
          if (l < n && worse(ks(l), ids(l), ks(w), ids(w))) w = l
          if (r < n && worse(ks(r), ids(r), ks(w), ids(w))) w = r
          if (w == i) done = true
          else {
            val tk = ks(i); ks(i) = ks(w); ks(w) = tk
            val ti = ids(i); ids(i) = ids(w); ids(w) = ti
            val ts = ss(i); ss(i) = ss(w); ss(w) = ts
            i = w
          }
        }
      }
      def siftUp(q: Int, from: Int): Unit = {
        val ks = keys(q); val ids = hIds(q); val ss = hSims(q)
        var i = from
        while (i > 0) {
          val p = (i - 1) / 2
          if (worse(ks(i), ids(i), ks(p), ids(p))) {
            val tk = ks(i); ks(i) = ks(p); ks(p) = tk
            val ti = ids(i); ids(i) = ids(p); ids(p) = ti
            val ts = ss(i); ss(i) = ss(p); ss(p) = ts
            i = p
          } else i = 0
        }
      }
      def offer(q: Int, key: Double, id: AnyRef, sim: java.lang.Double): Unit = {
        val n = sizes(q)
        if (n < k) {
          keys(q)(n) = key; hIds(q)(n) = id; hSims(q)(n) = sim
          sizes(q) = n + 1; siftUp(q, n)
        } else if (worse(keys(q)(0), hIds(q)(0), key, id)) {
          keys(q)(0) = key; hIds(q)(0) = id; hSims(q)(0) = sim
          siftDown(q)
        }
      }

      // k+1 smallest null-vector ids (ascending) — superset of any null
      // rows the global top-k could admit for any query
      val nullIds = new java.util.ArrayList[AnyRef]()
      def offerNull(id: AnyRef): Unit = {
        var pos = 0
        while (pos < nullIds.size() && cmpId(nullIds.get(pos), id) < 0) pos += 1
        if (pos < k + 1) {
          nullIds.add(pos, id)
          if (nullIds.size() > k + 1) nullIds.remove(k + 1)
        }
      }

      it.foreach { row =>
        val nid = if (row.isNullAt(0)) null else row.get(0).asInstanceOf[AnyRef]
        if (nid != null) { // null neighbor id never satisfies the join condition
          if (row.isNullAt(1)) offerNull(nid)
          else {
            val nv = row.getSeq[Double](1).toArray
            var acc = 0.0; var i = 0
            while (i < nv.length) { acc += nv(i) * nv(i); i += 1 }
            val nn = math.sqrt(acc)
            var q = 0
            while (q < nQ) {
              if (!idEq(qIds(q), nid)) {
                val qv = vecs(q)
                val n = math.min(qv.length, nv.length)
                var dot = 0.0; i = 0
                while (i < n) { dot += qv(i) * nv(i); i += 1 }
                val raw = dot / (norms(q) * nn)
                val rawKey =
                  if (java.lang.Double.isNaN(raw)) Double.PositiveInfinity else raw
                if (sizes(q) < k || !(rawKey + rejectMargin < keys(q)(0))) {
                  val sim = roundLike(raw, roundDp)
                  val key =
                    if (java.lang.Double.isNaN(sim)) Double.PositiveInfinity else sim
                  offer(q, key, nid, java.lang.Double.valueOf(sim))
                }
              }
              q += 1
            }
          }
        }
      }

      val rows = Seq.newBuilder[Row]
      var q = 0
      while (q < nQ) {
        var j = 0
        while (j < sizes(q)) {
          rows += Row(qIds(q), hIds(q)(j), hSims(q)(j))
          j += 1
        }
        var p = 0
        while (p < nullIds.size()) {
          if (!idEq(qIds(q), nullIds.get(p)))
            rows += Row(qIds(q), nullIds.get(p), null)
          p += 1
        }
        q += 1
      }
      rows.result().iterator
    }(Encoders.row(outSchema))
    out.toDF("query_id", "neighbor_id", "sim")
  }
}
