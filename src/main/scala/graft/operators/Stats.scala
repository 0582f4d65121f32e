package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution statistics — the Spark form of the reference's duration
  * statistics and histogram metrics (reference:
  * src/lakehouse/quality/metrics/distribution.py:19-108 stats,
  * :218-319 fixed-edge histograms).
  */
object Stats {

  /** Exact interpolated percentile (matches DuckDB `quantile_cont` and the
    * reference's numpy percentile). Use `percentile_approx` at scale where
    * an oracle-exact answer is not required. */
  def pct(c: Column, p: Double): Column = percentile(c, lit(p))

  /** Fixed-edge histogram bin index: edges (e0 < e1 < ... < ek) produce
    * bins [e0,e1), [e1,e2), ..., [ek, +inf) numbered 0..k; values below
    * e0 get bin -1. Pure `when` chain — codegen-friendly, and expressible
    * as an identical CASE in any SQL oracle. */
  def binIndex(value: Column, edges: Seq[Double]): Column = {
    require(edges.nonEmpty && edges == edges.sorted, "edges must be ascending")
    val belowFirst = when(value < edges.head, lit(-1))
    val mids = edges.sliding(2).zipWithIndex.foldLeft(belowFirst) {
      case (acc, (Seq(_, hi), i)) => acc.when(value < hi, lit(i))
      case (acc, _)               => acc
    }
    mids.otherwise(lit(edges.size - 1))
  }

  /** Histogram with counts and percentages (pct computed with one double
    * division — deterministic cross-engine). */
  def histogram(df: DataFrame, value: Column, edges: Seq[Double],
      extraGroupCols: Seq[String] = Nil): DataFrame = {
    val grouped = df
      .withColumn("bin_id", binIndex(value, edges))
      .groupBy((extraGroupCols :+ "bin_id").map(col): _*)
      .agg(count(lit(1)).as("n"))
    val total = org.apache.spark.sql.expressions.Window
      .partitionBy(extraGroupCols.map(col): _*)
    grouped.withColumn("pct",
      round(lit(100.0) * col("n") / sum(col("n")).over(total), 4))
  }
}
