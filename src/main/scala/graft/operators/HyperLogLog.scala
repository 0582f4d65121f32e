package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

/** X94 HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007, public
  * algorithm): distinct-count estimation over an UNBOUNDED key space in
  * bounded memory — completing the sketch family beside Count-Min
  * ("how often did THIS key occur", [[CountMin]]) and Misra–Gries
  * ("which keys are heavy", [[TextAnalysis.heavyHitters]]): HLL answers
  * "how many DISTINCT keys" with relative error ≈ 1.04/√m.
  *
  * Spark itself ships HLL++ behind `approx_count_distinct` — the right
  * call inside one query. This object exists for the pipeline uses the
  * built-in can't serve: the SKETCH ITSELF as a mergeable artifact.
  * Per-day / per-snapshot register arrays can be stored (m bytes each),
  * merged by element-wise max across arbitrary time windows, and
  * re-estimated without touching the data again — incremental corpus
  * accounting (distinct tokens/users/urls to date) at 100 TB where
  * re-scanning history per question is not viable.
  *
  * Scale shape: identical to [[CountMin.build]] — one map-only pass
  * folds each partition into a 2^p-byte register array, arrays merge by
  * max on the driver (a model object, never a data-sized collect), and
  * the key stream never shuffles.
  *
  * Hashing: two seeded MurmurHash3 32-bit passes concatenated to 64
  * bits — deterministic across JVMs and partitionings, so re-runs and
  * backfills agree register-for-register. With 64-bit hashes the
  * classic 32-bit large-range correction is unnecessary; the
  * small-range regime uses linear counting, per the paper.
  */
object HyperLogLog {

  private def hash64(key: String): Long = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(key, 0x2545f491)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(key, 0x9e3779b9)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  /** In-place add (the per-partition hot loop — no allocation per key). */
  private def addTo(regs: Array[Byte], p: Int, key: String): Unit = {
    val h = hash64(key)
    val bucket = (h >>> (64 - p)).toInt
    // rank = leading zeros of the remaining 64-p bits, +1; the p consumed
    // bits are masked off by shifting them out low
    val rest = h << p
    val rank = (if (rest == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > regs(bucket)) regs(bucket) = rank.toByte
  }

  final case class Sketch(p: Int, regs: Array[Byte]) {
    def m: Int = 1 << p

    def add(key: String): Sketch = {
      val r = regs.clone()
      addTo(r, p, key)
      Sketch(p, r)
    }

    /** Element-wise max — the union of the underlying sets. */
    def merge(other: Sketch): Sketch = {
      require(other.p == p, s"incompatible precision: ${other.p} vs $p")
      val out = new Array[Byte](regs.length)
      var i = 0
      while (i < out.length) {
        out(i) = if (regs(i) >= other.regs(i)) regs(i) else other.regs(i)
        i += 1
      }
      Sketch(p, out)
    }

    /** Harmonic-mean estimate with the paper's small-range correction
      * (linear counting while the raw estimate is ≤ 2.5m and empty
      * registers remain). */
    def estimate: Double = {
      val mm = m.toDouble
      var invSum = 0.0
      var zeros = 0
      var i = 0
      while (i < regs.length) {
        invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
        if (regs(i) == 0) zeros += 1
        i += 1
      }
      val alpha =
        if (m == 16) 0.673
        else if (m == 32) 0.697
        else if (m == 64) 0.709
        else 0.7213 / (1.0 + 1.079 / mm)
      val raw = alpha * mm * mm / invSum
      if (raw <= 2.5 * mm && zeros > 0) mm * math.log(mm / zeros.toDouble)
      else raw
    }
  }

  def empty(p: Int = 12): Sketch = {
    require(p >= 4 && p <= 18, s"precision must be in [4, 18], got $p")
    Sketch(p, new Array[Byte](1 << p))
  }

  /** Build one sketch for a string key column: per-partition in-place
    * fold + driver merge of the bounded register arrays. */
  def build(df: DataFrame, keyCol: String, p: Int = 12): Sketch = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys: Dataset[String] = df.select(col(keyCol).cast("string")).as[String]
    keys.mapPartitions { it =>
      val regs = new Array[Byte](1 << p)
      it.foreach { k => if (k != null) addTo(regs, p, k) }
      Iterator.single(regs)
    }.collect()
      .foldLeft(empty(p))((acc, r) => acc.merge(Sketch(p, r)))
  }
}
