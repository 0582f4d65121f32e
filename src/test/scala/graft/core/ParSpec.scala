package graft.core

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Par.spread: repartitions a partition-starved input up to cluster
  * parallelism, leaves a well-split input untouched, and never changes
  * results — the first-stage-parallelism repair for single-row-group
  * parquet (see docs/SCALE.md "Empirical scale proof").
  */
class ParSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("starved input above the size gate is spread; results unchanged") {
    val cores = spark.sparkContext.defaultParallelism
    assume(cores >= 4, "needs a multi-core session to observe a spread")
    spark.conf.set("spark.graft.spread.minBytes", "1")
    try {
      val one = spark.range(0, 1000).toDF("id").coalesce(1)
      val spread = Par.spread(one)
      assert(one.rdd.getNumPartitions == 1)
      assert(spread.rdd.getNumPartitions == cores,
        s"expected $cores partitions, got ${spread.rdd.getNumPartitions}")
      assert(spread.agg(sum(col("id"))).head.getLong(0) == 999L * 1000 / 2)
    } finally spark.conf.unset("spark.graft.spread.minBytes")
  }

  test("well-split input passes through with no exchange") {
    val cores = spark.sparkContext.defaultParallelism
    spark.conf.set("spark.graft.spread.minBytes", "1")
    try {
      val wide = spark.range(0, 1000).toDF("id").repartition(cores)
      val out = Par.spread(wide)
      assert(out eq wide, "spread must be a no-op when 2×partitions ≥ cores")
    } finally spark.conf.unset("spark.graft.spread.minBytes")
  }

  test("starved-but-tiny input passes through: the exchange costs more than it saves") {
    val one = spark.range(0, 100).toDF("id").coalesce(1)
    val out = Par.spread(one)
    assert(out eq one,
      "spread must be a no-op under spark.graft.spread.minBytes")
  }

  test("streaming input passes through untouched (no .rdd on unstarted streams)") {
    val stream = spark.readStream.format("rate").load()
    val out = Par.spread(stream)
    assert(out eq stream, "spread must be a no-op on streaming frames")
  }

  test("projection still prunes through the spread to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_par").toString
    spark.range(0, 100)
      .select(col("id").as("a"), col("id").cast("string").as("b"),
        (col("id") * 2).as("c"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    spark.conf.set("spark.graft.spread.minBytes", "1")
    try {
      val pruned = Par.spread(spark.read.parquet(dir)).select("a")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange RoundRobinPartitioning") ||
        plan.contains("AQEShuffleRead"),
        s"tiny gate must force the spread in this test:\n$plan")
      assert(plan.contains("ReadSchema: struct<a:bigint>"),
        s"column pruning must reach the scan through Repartition:\n$plan")
    } finally spark.conf.unset("spark.graft.spread.minBytes")
  }
}
