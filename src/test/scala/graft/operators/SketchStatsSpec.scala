package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SketchStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("distributed count-min build equals the single-fold sketch and bounds real counts") {
    import spark.implicits._
    val keys = (1 to 400).map(i => s"k${i % 37}") ++ Seq.fill(100)("hot")
    val df = keys.toDF("k").repartition(7)
    val s = CountMin.build(df, "k", width = 256, depth = 4)
    val whole = keys.foldLeft(CountMin.empty(256, 4))((acc, k) => acc.add(k))
    assert(s.counts.sameElements(whole.counts) && s.n == 500L,
      "partitioned build must equal the order-free single fold")
    assert(s.estimate("hot") >= 100L && s.estimate("hot") <= 500L,
      s"hot=${s.estimate("hot")}")
    val est = CountMin.estimates(spark, s, Seq("hot", "k1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") == s.estimate("hot") && est("k1") >= 11L)
  }

  test("distributed HLL build equals the single fold and estimates distincts") {
    import spark.implicits._
    val keys = (1 to 3000).map(i => s"k${i % 700}") // 700 distinct
    val df = keys.toDF("k").repartition(7)
    val s = HyperLogLog.build(df, "k", p = 12)
    val whole = keys.foldLeft(HyperLogLog.empty(12))((acc, k) => acc.add(k))
    assert(s.regs.sameElements(whole.regs),
      "partitioned build must equal the order-free single fold")
    assert(math.abs(s.estimate - 700.0) / 700.0 < 0.10, s"est=${s.estimate}")
    // snapshot merge: yesterday's keys + today's half-overlapping keys
    val today = HyperLogLog.build(
      (1 to 1000).map(i => s"k${350 + (i % 700)}").toDF("k"), "k", p = 12)
    val union = s.merge(today).estimate
    assert(union > s.estimate && math.abs(union - 1050.0) / 1050.0 < 0.10,
      s"union=$union")
  }

  test("approx stats land within documented error of the exact answers") {
    // skewed data: squares of 0..19999, 5000 distinct keys
    val df = spark.range(20000).select(
      (col("id") * col("id")).cast("double").as("v"),
      (col("id") % 5000).as("k"))
    val r = Stats.approxValueStats(df, col("v"), col("k"),
      accuracy = 10000, rsd = 0.02).head()

    val exact = df.agg(
      percentile(col("v"), lit(0.5)).as("p50"),
      percentile(col("v"), lit(0.95)).as("p95")).head()

    // GK rank error ≤ n/accuracy = 2 ranks here; values jump ~2·v/idx per
    // rank, so compare by RANK proximity via the value itself
    assert(math.abs(r.getAs[Double]("p50") - exact.getDouble(0)) /
      exact.getDouble(0) < 0.01)
    assert(math.abs(r.getAs[Double]("p95") - exact.getDouble(1)) /
      exact.getDouble(1) < 0.01)
    // HLL++ at rsd=0.02: 5000 distinct within ±3·rsd
    val d = r.getAs[Long]("approx_distinct").toDouble
    assert(math.abs(d - 5000) / 5000 < 0.06, s"approx distinct $d")
    assert(r.getAs[Long]("n") == 20000)
    assert(r.getAs[Double]("min_v") == 0.0)
  }
}
