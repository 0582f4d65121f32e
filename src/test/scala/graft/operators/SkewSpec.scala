package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // one hot key (90% of rows) plus a long tail
  private lazy val big = ((1 to 900).map(i => ("hot", i)) ++
    (1 to 100).map(i => (s"k${i % 10}", i))).toDF("key", "v")
  private lazy val small = (Seq("hot") ++ (0 until 10).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, i * 1.5) }.toDF("key", "w")

  test("salted join equals the plain join") {
    val plain = big.join(small, "key")
      .select("key", "v", "w").collect().map(_.toSeq).toSeq.sorted(RowOrd)
    val salted = Skew.saltedJoin(big, small, "key", nSalts = 8)
      .select("key", "v", "w").collect().map(_.toSeq).toSeq.sorted(RowOrd)
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("salted join spreads the hot key over multiple salts") {
    val salts = big
      .withColumn("_salt", pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)))
      .filter(col("key") === "hot")
      .select("_salt").distinct().count()
    assert(salts > 4) // 900 rows across 8 salts: all/most salts hit
  }

  test("salted aggregation equals the direct aggregation") {
    val direct = big.groupBy("key").agg(sum(col("v")).as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(big, "key", "v", nSalts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("salted join rejects join types that would duplicate small-side rows") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, small, "key", nSalts = 4, joinType = "right")
    }
    assert(e.getMessage.contains("per salt"))
    // left_anti is salt-safe: big keys absent from small survive once
    val anti = Skew.saltedJoin(big, small.filter(col("key") =!= "hot"), "key",
      nSalts = 4, joinType = "left_anti")
    assert(anti.count() == 900) // exactly the hot rows, no duplicates
  }

  test("hotKeys surfaces the dominant key first") {
    val top = Skew.hotKeys(big, "key", 3).collect()
    assert(top.head.getString(0) == "hot" && top.head.getLong(1) == 900L)
  }

  private object RowOrd extends Ordering[Seq[Any]] {
    def compare(a: Seq[Any], b: Seq[Any]): Int =
      a.map(_.toString).mkString("|").compareTo(b.map(_.toString).mkString("|"))
  }
}
