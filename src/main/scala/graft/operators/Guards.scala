package graft.operators

import org.apache.spark.sql.DataFrame

/** Size guards for operators whose exact contract is inherently O(n²).
  *
  * Generalizes the reference's fuzzy-dedup guard, which silently skips its
  * O(n²) pass above 10k rows (src/lakehouse/quality/metrics/integrity.py:
  * 559-569). Silent skipping is the wrong failure mode for a library: here
  * the guard is explicit — above the cap the operator throws, naming the
  * approximate path to switch to (MinHash-LSH for sets, IVF for vectors,
  * pigeonhole banding for simhash), and the caller either switches or
  * raises the cap consciously.
  */
object Guards {

  /** Default cap for exact all-pairs operators. 200k rows is already
    * ~2·10^10 pair comparisons — the edge of one-job sanity on a mid-size
    * cluster; anything larger must take a sub-quadratic path. */
  val DefaultExactPairRows: Long = 200000L

  /** Count-and-check. Returns the row count so callers can reuse it.
    * The count collapses to a column-pruned scan (metadata-only on
    * parquet sources), so the extra pass is cheap relative to the O(n²)
    * work it protects. */
  def requireAtMost(df: DataFrame, maxRows: Long, op: String, alternative: String): Long = {
    val n = df.count()
    if (n > maxRows)
      throw new IllegalArgumentException(
        s"$op: input has $n rows (guard: $maxRows); the exact all-pairs contract would cost " +
          s"~${n / 2 * n} comparisons. $alternative, or raise maxRows explicitly.")
    n
  }

  /** Guard-and-materialize in one pass, for a side that is about to be
    * broadcast anyway: Spark would collect it to the driver per action
    * regardless, so a separate count job just duplicates that work (it
    * showed up as ~30% of exact-kNN latency). Collects at most
    * maxRows + 1 rows (early-exit limit), throws past the cap, and
    * returns the rows so the caller can re-plan the side as a local
    * relation — leaving the main job as the only Spark action. */
  def collectAtMost(df: DataFrame, maxRows: Long, op: String,
      alternative: String): Array[org.apache.spark.sql.Row] = {
    val bounded =
      if (maxRows >= Int.MaxValue - 1) df else df.limit(maxRows.toInt + 1)
    val rows = bounded.collect()
    if (rows.length > maxRows)
      throw new IllegalArgumentException(
        s"$op: input exceeds $maxRows rows (guard); the exact all-pairs contract " +
          s"is quadratic past this point. $alternative, or raise maxRows explicitly.")
    rows
  }
}
