package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only probe: isolate the events-table scan + timestamp-decode cost
  * from query logic. The corpus regenerated between rounds 5 and 6 with
  * `ts` re-encoded ns-INT64 → µs TIMESTAMP_NTZ; every events query pays
  * the decode + `unix_micros(cast)` conversion where it previously read
  * a raw INT64 column. This prints the steady-state scan cost with and
  * without the ts column so the per-query share of a round-over-round
  * regression is attributable to the data change, not the plan.
  * Usage: runMain graft.tools.EventsScanProbe [sfDir]. */
object EventsScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Long): Unit =
      (1 to 5).foreach { i =>
        val t0 = System.nanoTime()
        val v = body
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e6}%.0f ms (v=$v)")
      }
    time("no_ts  (sum event_id)") {
      graft.Tables.events(spark, dir).agg(sum("event_id")).first().getLong(0)
    }
    time("with_ts (max ts µs)") {
      graft.Tables.events(spark, dir).agg(max("ts")).first().getLong(0)
    }
    spark.stop()
  }
}
