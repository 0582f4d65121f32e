package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("as-of picks the latest right at or before each left ts, null before any") {
    val left = Seq((1L, 100L, 5L), (1L, 101L, 15L), (1L, 102L, 20L), (2L, 200L, 50L))
      .toDF("k", "lid", "lts")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (3L, 1L, "z"))
      .toDF("k", "rts", "payload")
    val out = AsOf.join(left, right, "k", "lts", "rts", Seq("payload"))
      .select("lid", "asof_payload").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(100L).isEmpty)          // lts=5 before any right
    assert(out(101L).contains("a"))    // lts=15 → rts=10
    assert(out(102L).contains("b"))    // lts=20 → tie counts (rts=20)
    assert(out(200L).isEmpty)          // key 2 has no right rows
  }

  test("colliding payload column names are refused") {
    val left = Seq((1L, 1L, "x")).toDF("k", "lts", "payload")
    val right = Seq((1L, 1L, "y")).toDF("k", "rts", "payload")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(left, right, "k", "lts", "rts", Seq("payload"))
    }
    assert(e.getMessage.contains("payload"))
  }
}
