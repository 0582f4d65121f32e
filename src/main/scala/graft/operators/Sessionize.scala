package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization — the Spark-native form of the
  * reference's span/beat generation loops
  * (reference: src/lakehouse/aggregation/spans.py:113-249 — break on
  * speaker change or silence gap; beats.py:219-279 — break on change/gap).
  *
  * One shuffle (on the partition key) and pure window expressions;
  * everything after the shuffle is narrow, so the plan scales linearly
  * with the number of partition-key groups regardless of total volume.
  */
object Sessionize {

  /** Cumulative-sum island id over an ordered window.
    * `isBreak` must be true on the first row of each island (rows where
    * lag is null count as breaks). */
  def islandId(partitionBy: Seq[Column], orderBy: Seq[Column], isBreak: Column): Column = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sum(when(isBreak, 1L).otherwise(0L)).over(w)
  }

  /** Adds a `session_seq` column: new session when the gap since the
    * previous row exceeds `maxGap` (same units as `tsCol`) or any of
    * `changeCols` differs from the previous row.
    *
    * `tieCols` make ordering total (required for determinism when
    * timestamps collide). */
  def withSessions(
      df: DataFrame,
      partitionCols: Seq[String],
      tsCol: String,
      tieCols: Seq[String],
      maxGap: Long,
      changeCols: Seq[String] = Nil,
      outCol: String = "session_seq"): DataFrame = {
    val part = partitionCols.map(col)
    val order = (tsCol +: tieCols).map(col)
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    val changed = changeCols
      .map(c => lag(col(c), 1).over(w) =!= col(c))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    val brk = prevTs.isNull || (col(tsCol) - prevTs > maxGap) || changed
    df.withColumn(outCol, islandId(part, order, brk))
  }
}
