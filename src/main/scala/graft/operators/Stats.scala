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

  /** Sketch-based approximate distribution stats — the scale path where
    * the exact forms stop being affordable: exact percentiles are a full
    * sort per group and exact distinct counts a full shuffle of the
    * distinct keys, while `approx_percentile` (Greenwald-Khanna, error
    * ≤ 1/accuracy of rank) and `approx_count_distinct` (HLL++, relative
    * error ≈ rsd) are single-pass, constant-memory, and partial-merge
    * like any aggregate. Use the exact forms for oracles and release
    * gates; use this for 100 TB dashboards and guardrail monitors. */
  def approxValueStats(df: DataFrame, value: Column, distinctCol: Column,
      groupCols: Seq[String] = Nil,
      accuracy: Int = 10000, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(distinctCol, rsd).as("approx_distinct"),
        percentile_approx(value, lit(0.5), lit(accuracy)).as("p50"),
        percentile_approx(value, lit(0.95), lit(accuracy)).as("p95"),
        percentile_approx(value, lit(0.99), lit(accuracy)).as("p99"),
        min(value).as("min_v"), max(value).as("max_v"))
}
