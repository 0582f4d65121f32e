package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only probe: break q49_validation_checks into its component jobs and
  * time each one separately in a warm JVM, so a composite-latency regression
  * is attributable to a specific check family rather than the whole union. */
object ValidationProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Tables
    def time(name: String)(f: => Long): Unit = {
      // warm once, then report median of 3
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"$name%-28s ${ts(1)}%8.0f ms")
    }
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val events = Tables.events(spark, dir)
    val customer = Tables.customer(spark, dir)

    time("orders counter agg") {
      orders.agg(count(lit(1)), sum(when(col("o_orderkey").isNull, 1L))).collect().length.toLong
    }
    time("lineitem counter agg") {
      lineitem.agg(count(lit(1)), sum(when(col("l_orderkey").isNull, 1L))).collect().length.toLong
    }
    time("events counter agg") {
      events.agg(count(lit(1)), sum(when(col("event_id").isNull, 1L))).collect().length.toLong
    }
    time("orders pk dup") {
      orders.filter(col("o_orderkey").isNotNull).groupBy("o_orderkey")
        .agg(count(lit(1)).as("_n")).agg(coalesce(sum(col("_n") - 1), lit(0L))).collect().length.toLong
    }
    time("lineitem pk dup") {
      lineitem.filter(col("l_orderkey").isNotNull && col("l_linenumber").isNotNull)
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("_n")).agg(coalesce(sum(col("_n") - 1), lit(0L))).collect().length.toLong
    }
    time("events pk dup") {
      events.filter(col("event_id").isNotNull).groupBy("event_id")
        .agg(count(lit(1)).as("_n")).agg(coalesce(sum(col("_n") - 1), lit(0L))).collect().length.toLong
    }
    time("orders fk distinct") {
      orders.filter(col("o_custkey").isNotNull).select("o_custkey").distinct()
        .agg(count(lit(1))).collect().length.toLong
    }
    time("lineitem fk distinct") {
      lineitem.filter(col("l_orderkey").isNotNull).select("l_orderkey").distinct()
        .agg(count(lit(1))).collect().length.toLong
    }
    time("orders anti customer") {
      orders.select("o_custkey").filter(col("o_custkey").isNotNull)
        .join(customer.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
        .agg(count(lit(1))).collect().length.toLong
    }
    time("lineitem anti orders") {
      lineitem.select("l_orderkey").filter(col("l_orderkey").isNotNull)
        .join(orders.select(col("o_orderkey").as("l_orderkey")), Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1))).collect().length.toLong
    }
    time("FULL q49") {
      graft.SparkEntry.queries("q49_validation_checks")(spark, dir).collect().length.toLong
    }
    spark.stop()
  }
}
