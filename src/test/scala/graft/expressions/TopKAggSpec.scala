package graft.expressions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** TopKMin must reproduce the `row_number().over(...) <= k` idiom
  * bit-for-bit — same rows, same order — across partition layouts (the
  * partial/merge path) and at group sizes below, at, and above k. */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("v"), col("id"))
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select("g", "id", "v", "rnk")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g")
      .agg(TopKMin.topkMin(struct(col("v"), col("id")), k).as("_tk"))
      .select(col("g"), posexplode(col("_tk")))
      .select(col("g"), col("col.id").as("id"), col("col.v").as("v"),
        (col("pos") + 1).as("rnk"))

  test("matches the ranking-window result on random data, any partitioning") {
    val rng = new scala.util.Random(42)
    val rows = (1 to 2000).map { i =>
      (rng.nextInt(37).toLong, i.toLong, math.floor(rng.nextDouble() * 100) / 10)
    }
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("g", "id", "v").repartition(parts)
      val exp = windowTopK(df, 5).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val got = aggTopK(df, 5).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(got == exp, s"parts=$parts")
    }
  }

  test("groups smaller than k return all their rows, ranked") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 0.5), (2L, 20L, 3.0)).toDF("g", "id", "v")
    val got = aggTopK(df, 5).orderBy("g", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    assert(got.toSeq == Seq((1L, 11L, 1), (1L, 10L, 2), (2L, 20L, 1)))
  }

  test("ties on the sort value break on the second struct field") {
    val df = Seq((1L, 30L, 1.0), (1L, 10L, 1.0), (1L, 20L, 1.0)).toDF("g", "id", "v")
    val got = aggTopK(df, 2).orderBy("rnk").collect().map(_.getLong(1))
    assert(got.toSeq == Seq(10L, 20L))
  }

  test("sort-based fallback (many groups) matches the hash path") {
    // ObjectHashAggregate falls back to sort-based aggregation past the
    // in-memory group threshold; force it immediately so the fallback's
    // serialize/merge path is exercised and must agree with the hash path
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.get(key)
    try {
      val rng = new scala.util.Random(7)
      val rows = (1 to 3000).map { i =>
        (rng.nextInt(97).toLong, i.toLong, rng.nextInt(1000) / 10.0)
      }
      val df = rows.toDF("g", "id", "v").repartition(13)
      val exp = windowTopK(df, 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      spark.conf.set(key, "1")
      val got = aggTopK(df, 4).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(got == exp)
    } finally spark.conf.set(key, prev)
  }

  test("string payloads survive the copy/serialize path") {
    val df = (1 to 500).map(i => (i % 5, s"id_$i", (i % 13).toDouble))
      .toDF("g", "id", "v").repartition(11)
    val got = df.groupBy("g")
      .agg(TopKMin.topkMin(struct(col("v"), col("id")), 3).as("_tk"))
      .select(col("g"), explode(col("_tk")).as("e"))
      .select(col("g"), col("e.id"), col("e.v"))
      .collect()
    assert(got.length == 15)
    assert(got.forall(_.getString(1).startsWith("id_")))
  }
}
