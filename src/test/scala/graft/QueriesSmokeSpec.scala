package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every driver-contract query runs on sf0.001 and (where data admits)
  * returns rows; every oracle entry has a matching query. */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // empty-by-design on this corpus is acceptable for these:
  private val mayBeEmpty = Set("q13_cust_without_orders", "q19_minhash_neardup")

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
