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
}
