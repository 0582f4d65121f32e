package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BloomIncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bloom prefilter keeps every joining row and drops most others") {
    val big = spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val small = spark.range(100).select((col("id") * 997).as("k"))

    val pre = Bloom.semiJoinPrefilter(big, "k", small, "k",
      expectedItems = 1000, numBits = 1 << 16)
    val kept = pre.count()
    // no false negatives: the semi-join result is identical
    val exact = big.join(small, Seq("k"), "left_semi").count()
    assert(pre.join(small, Seq("k"), "left_semi").count() == exact)
    // and the prefilter actually filtered (≥ 90% of non-matches dropped)
    assert(kept < 10000, s"bloom kept $kept of 100000 rows")
    assert(kept >= exact)
  }

  test("incremental agg refresh equals full recompute over all batches") {
    val specs = Seq(IncrementalAgg.Spec("v", Seq("sum", "count", "min", "max")))
    val batches = Seq(
      Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)),
      Seq(("a", -3.0), ("c", 7.0)),
      Seq(("b", 0.5), ("c", 7.5), ("a", 100.0)))
      .map(_.toDF("k", "v"))

    val incremental = batches.foldLeft(Option.empty[org.apache.spark.sql.DataFrame]) {
      (state, b) => Some(IncrementalAgg.refresh(state, b, Seq("k"), specs))
    }.get
    val full = IncrementalAgg.aggregate(
      batches.reduce(_ unionByName _), Seq("k"), specs)

    val a = incremental.orderBy("k").collect().map(_.toSeq)
    val b = full.orderBy("k").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    // spot-check one merged row
    val row = incremental.filter(col("k") === "a").head()
    assert(row.getAs[Long]("rows") == 4)
    assert(row.getAs[Double]("v_sum") == 100.0)
    assert(row.getAs[Double]("v_min") == -3.0)
    assert(row.getAs[Double]("v_max") == 100.0)
  }

  test("merge refuses unknown state columns and mismatched schemas") {
    val st = Seq(("a", 1L, 2.0)).toDF("k", "rows", "v_sum")
    val bad = Seq(("a", 1L, 2.0)).toDF("k", "rows", "v_weird")
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(st, bad, Seq("k"))
    }
    val weird = Seq(("a", 1L, 2.0)).toDF("k", "rows", "v_weird")
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(weird, weird, Seq("k")).collect()
    }
  }
}
