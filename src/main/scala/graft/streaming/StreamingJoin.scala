package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream event-time interval join (the attribution shape: match
  * each left event to right events with the same key inside an event-time
  * window around it). Both sides carry watermarks AND the join condition
  * carries an explicit time range — that pair is what lets Spark expire
  * join state on both sides; an equi-join of two streams without the
  * range bound accumulates state forever, which is the way stream joins
  * actually die at production scale.
  */
object StreamingJoin {

  /** Join rows of `left` to rows of `right` sharing `keyCol` whose
    * `rightTs` falls in `[leftTs - before, leftTs + after]`. Column names
    * other than `keyCol` must be disjoint between the two sides (rename
    * upstream — keeping the API explicit beats silent suffixing). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      before: String = "30 seconds", after: String = "30 seconds",
      leftWatermark: String = "1 minute",
      rightWatermark: String = "1 minute"): DataFrame = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"column names must be disjoint apart from '$keyCol'; shared: ${overlap.mkString(", ")}")
    require(left.columns.contains(leftTs) && right.columns.contains(rightTs),
      s"timestamp columns $leftTs/$rightTs must exist on their sides")
    val l = left.withWatermark(leftTs, leftWatermark).alias("l")
    val r = right.withWatermark(rightTs, rightWatermark).alias("r")
    l.join(r,
      expr(s"l.$keyCol = r.$keyCol AND " +
        s"r.$rightTs >= l.$leftTs - interval '$before' AND " +
        s"r.$rightTs <= l.$leftTs + interval '$after'"))
      .drop(r(keyCol))
  }
}
