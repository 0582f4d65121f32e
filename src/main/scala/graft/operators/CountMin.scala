package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** X89 Count-Min sketch (Cormode & Muthukrishnan, public algorithm):
  * point-frequency estimation over an UNBOUNDED key space in bounded
  * memory — the companion to the Misra–Gries top-k sketch
  * ([[TextAnalysis.heavyHitters]]) and the GK/HLL++ aggregates
  * ([[Stats.approxValueStats]]). Misra–Gries answers "what are the
  * heavy keys" with an undercount bound; CMS answers "how often did
  * THIS key occur" with an overcount bound (est ≥ true always,
  * est ≤ true + e/width·N with probability 1 − e^−depth per query).
  *
  * Scale shape: one map-only pass folds each partition into a
  * depth×width counter matrix (a few KB — bounded regardless of key
  * cardinality); matrices merge by element-wise sum on the driver, like
  * IVF centroids — a model object, never a data-sized collect. The key
  * stream itself never shuffles, which is the whole point at 100 TB:
  * an exact per-key count would shuffle the full distinct key space.
  *
  * Hashing: MurmurHash3 with row-indexed seeds — deterministic across
  * JVMs and partitionings, so the same corpus always yields the same
  * sketch (re-runs and backfills agree bit-for-bit).
  */
object CountMin {

  private def slotOf(width: Int, row: Int, key: String): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(key, 0x9747b28c + row)
    row * width + java.lang.Math.floorMod(h, width)
  }

  /** In-place add into a raw counter matrix (the per-partition hot loop —
    * no allocation per key). */
  private def addTo(counts: Array[Long], width: Int, depth: Int,
      key: String, by: Long): Unit = {
    var r = 0
    while (r < depth) { counts(slotOf(width, r, key)) += by; r += 1 }
  }

  final case class Sketch(width: Int, depth: Int, counts: Array[Long], n: Long) {

    def add(key: String, by: Long = 1L): Sketch = {
      val c = counts.clone()
      addTo(c, width, depth, key, by)
      Sketch(width, depth, c, n + by)
    }

    /** Upper-biased point estimate: min over rows — never below the true
      * count, above it only by colliding mass. */
    def estimate(key: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counts(slotOf(width, r, key))
        if (c < best) best = c
        r += 1
      }
      best
    }

    def merge(other: Sketch): Sketch = {
      require(other.width == width && other.depth == depth,
        s"incompatible sketch geometry: ${other.width}x${other.depth} vs ${width}x$depth")
      val out = new Array[Long](counts.length)
      var i = 0
      while (i < out.length) { out(i) = counts(i) + other.counts(i); i += 1 }
      Sketch(width, depth, out, n + other.n)
    }
  }

  def empty(width: Int = 2048, depth: Int = 4): Sketch =
    Sketch(width, depth, new Array[Long](width * depth), 0L)

  /** Build one sketch for a string key column: per-partition in-place
    * fold + driver merge of the bounded matrices. */
  def build(df: DataFrame, keyCol: String,
      width: Int = 2048, depth: Int = 4): Sketch = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys: Dataset[String] = df.select(col(keyCol).cast("string")).as[String]
    keys.mapPartitions { it =>
      val counts = new Array[Long](width * depth)
      var n = 0L
      it.foreach { k => if (k != null) { addTo(counts, width, depth, k, 1L); n += 1L } }
      Iterator.single((counts, n))
    }.collect()
      .foldLeft(empty(width, depth)) { case (acc, (c, n)) =>
        acc.merge(Sketch(width, depth, c, n))
      }
  }

  /** Estimates for a bounded, caller-chosen key list as a DataFrame —
    * the reporting form (e.g. watchlist terms over a 100 TB corpus
    * without a groupBy over the full vocabulary). */
  def estimates(spark: org.apache.spark.sql.SparkSession,
      sketch: Sketch, keys: Seq[String]): DataFrame = {
    import spark.implicits._
    keys.map(k => (k, sketch.estimate(k))).toDF("key", "est")
  }
}
