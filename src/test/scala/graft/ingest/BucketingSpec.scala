package graft.ingest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("co-bucketed tables join without a shuffle") {
    val facts = (1L to 1000L).map(i => (i, s"payload$i")).toDF("key", "payload")
    val dims = (1L to 200L).map(i => (i, i * 2.0)).toDF("key", "weight")
    Bucketing.writeBucketed(facts, "graft_bucket_facts", Seq("key"), 8, Seq("key"))
    Bucketing.writeBucketed(dims, "graft_bucket_dims", Seq("key"), 8, Seq("key"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a merge join so the bucket layout (not a broadcast) is what
      // avoids the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.readTable(spark, "graft_bucket_facts")
        .join(Bucketing.readTable(spark, "graft_bucket_dims"), "key")
      assert(joined.count() == 200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_dims")
    }
  }

  test("aggregation on the bucket key needs no exchange") {
    val facts = (1L to 500L).map(i => (i % 50, i.toDouble)).toDF("key", "v")
    Bucketing.writeBucketed(facts, "graft_bucket_agg", Seq("key"), 4)
    try {
      val agg = Bucketing.readTable(spark, "graft_bucket_agg")
        .groupBy("key").agg(sum(col("v")).as("total"))
      assert(agg.count() == 50)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation must not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS graft_bucket_agg")
  }
}
