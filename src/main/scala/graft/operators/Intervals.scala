package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over (start, end) columns — union duration, gaps,
  * pairwise overlaps (reference: src/lakehouse/quality/metrics/
  * coverage.py:19-80 merge-and-sum, :336-372 gap detection,
  * :374-427 sweep-line overlap detection).
  *
  * Spark-native formulation: the classic running-`max(end)` island trick
  * instead of the reference's imperative sweep — one shuffle on the
  * partition key, pure window expressions after it. Works on any numeric
  * type; callers should prefer integer units (e.g. nanoseconds) for
  * exactness.
  */
object Intervals {

  /** Tags each row with `_island`: overlapping/touching intervals share an
    * island. An interval starts a new island iff its start exceeds the
    * running max end of all previous intervals (ordered by start, end). */
  def withUnionIslands(
      df: DataFrame,
      partitionCols: Seq[String],
      startCol: String,
      endCol: String,
      islandCol: String = "_island"): DataFrame = {
    val part = partitionCols.map(col)
    val order = Seq(col(startCol), col(endCol))
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    val prevMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val brk = prevMax.isNull || col(startCol) > prevMax
    df.withColumn(islandCol, Sessionize.islandId(part, order, brk))
  }

  /** Per partition key: total length of the union of intervals and the
    * number of merged (disjoint) intervals. Coverage can never exceed the
    * enclosing range — the property the reference's A7/A8 metrics rely on. */
  def unionDuration(
      df: DataFrame,
      partitionCols: Seq[String],
      startCol: String,
      endCol: String,
      unionCol: String = "union_len",
      nIslandsCol: String = "n_islands"): DataFrame = {
    val islands = withUnionIslands(df, partitionCols, startCol, endCol)
    islands
      .groupBy((partitionCols :+ "_island").map(col): _*)
      .agg(min(col(startCol)).as("_s"), max(col(endCol)).as("_e"))
      .groupBy(partitionCols.map(col): _*)
      .agg(sum(col("_e") - col("_s")).as(unionCol), count(lit(1)).as(nIslandsCol))
  }

  /** Adds `_gap`: distance from the previous interval's end (ordered by
    * start; null on each partition's first row). Negative gap = overlap. */
  def withGapFromPrev(
      df: DataFrame,
      partitionCols: Seq[String],
      startCol: String,
      endCol: String,
      tieCols: Seq[String] = Nil,
      gapCol: String = "_gap"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy((Seq(startCol, endCol) ++ tieCols).map(col): _*)
    df.withColumn(gapCol, col(startCol) - lag(col(endCol), 1).over(w))
  }

  /** Count of strictly-overlapping interval pairs per partition key.
    * Equi-join on the partition key + range predicate; Catalyst plans the
    * equi part as a hash/sort-merge join so the quadratic blowup is
    * bounded per key, never global. `idCol` de-duplicates pairs (a<b). */
  def overlapPairCounts(
      df: DataFrame,
      partitionCols: Seq[String],
      startCol: String,
      endCol: String,
      idCol: String): DataFrame = {
    val a = df.alias("a")
    val b = df.alias("b")
    val keyEq = partitionCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    val cond = keyEq &&
      col(s"a.$idCol") < col(s"b.$idCol") &&
      col(s"a.$startCol") < col(s"b.$endCol") &&
      col(s"b.$startCol") < col(s"a.$endCol")
    a.join(b, cond)
      .groupBy(partitionCols.map(c => col(s"a.$c").as(c)): _*)
      .agg(count(lit(1)).as("n_overlap_pairs"))
  }

  /** [[overlapPairCounts]] at scale: BANDED range join. Each interval
    * explodes to the fixed-width time bands it touches, candidates come
    * from an equi-join on (key…, band), and the exact range predicate
    * verifies. A pair is counted exactly once by attributing it to the
    * band containing max(a.start, b.start) — the first band both touch
    * (strict overlap ⇒ max(start) < min(end), so that band lies in both
    * intervals' band ranges).
    *
    * Scale story: the shuffle key gains the band, so one hot partition
    * key (an episode with 10^6 segments) spreads over its time axis
    * instead of sending every pair to one reducer; candidates per band
    * are bounded by band occupancy, not by the key's total row count.
    * Choose `bandWidth` near the p95 interval length: shorter bands cut
    * candidate pairs, longer bands cut the per-interval fan-out
    * (len/width + 1 copies). */
  def overlapPairCountsBanded(
      df: DataFrame,
      partitionCols: Seq[String],
      startCol: String,
      endCol: String,
      idCol: String,
      bandWidth: Double): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val banded = df.withColumn("_band",
      explode(sequence(
        floor(col(startCol) / bandWidth).cast("long"),
        floor(col(endCol) / bandWidth).cast("long"))))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val keyEq = (partitionCols.map(c => col(s"a.$c") === col(s"b.$c")) :+
      (col("a._band") === col("b._band"))).reduce(_ && _)
    val cond = keyEq &&
      col(s"a.$idCol") < col(s"b.$idCol") &&
      col(s"a.$startCol") < col(s"b.$endCol") &&
      col(s"b.$startCol") < col(s"a.$endCol") &&
      col("a._band") ===
        floor(greatest(col(s"a.$startCol"), col(s"b.$startCol")) / bandWidth).cast("long")
    a.join(b, cond)
      .groupBy(partitionCols.map(c => col(s"a.$c").as(c)): _*)
      .agg(count(lit(1)).as("n_overlap_pairs"))
  }
}
