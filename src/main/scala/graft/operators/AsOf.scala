package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join (trades/quotes): each left row picks the LATEST
  * right row with the same key and right ts ≤ left ts.
  *
  * Planned as union + ONE window pass — interleave both sides on
  * (key, ts) with the right side sorting first on ties, then carry each
  * right payload forward with `last(_, ignoreNulls)` over a running
  * frame, and keep the left rows. No range join (whose band width must
  * be guessed), no per-key loop, no n×m candidate explosion: the cost is
  * exactly one shuffle-sort of |L|+|R| rows on the key — the same price
  * as any keyed window — and skew handling is whatever the key already
  * needs. DuckDB's native ASOF JOIN (ties-inclusive) is the oracle.
  */
object AsOf {

  /** `payloadCols` are taken from `right` and appear as `asof_<col>` on
    * the output (null when no right row precedes the left row). Column
    * sets of the two frames must not otherwise collide on non-key names.
    */
  def join(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    val overlap = left.columns.toSet.intersect(
      (payloadCols :+ rightTs).toSet.map((s: String) => s))
    require(overlap.isEmpty,
      s"left side already has columns ${overlap.mkString(", ")} — rename upstream")

    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_src", lit(1))
    val r = right.select((keyCol +: rightTs +: payloadCols).distinct.map(col): _*)
      .withColumn("_ts", col(rightTs))
      .withColumn("_src", lit(0))
      .drop(rightTs)

    val u = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at the same ts, so equality counts
    // as "already happened" — DuckDB ASOF (l.ts >= r.ts) ties match this
    val w = Window.partitionBy(keyCol).orderBy(col("_ts"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_src") === 1)
      .drop((payloadCols :+ "_ts" :+ "_src").map(identity): _*)
  }
}
