package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: registered views answer plain spark.sql. */
class SqlViewsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("createViews lets spark.sql join and aggregate the corpus") {
    Tables.createViews(spark, dir)
    val r = spark.sql(
      """SELECT r.r_name, count(*) AS n
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name ORDER BY r.r_name""".stripMargin).collect()
    assert(r.nonEmpty && r.map(_.getLong(1)).sum > 0)

    // events view keeps the µs-long ts contract
    val e = spark.sql("SELECT min(ts) AS lo, max(ts) AS hi FROM events").first()
    assert(e.getLong(0) > 1_600_000_000_000_000L) // µs since epoch, not ns
    assert(e.getLong(1) < 4_000_000_000_000_000L)

    val d = spark.sql("SELECT lang, count(*) FROM documents GROUP BY lang").collect()
    assert(d.nonEmpty)
  }
}
