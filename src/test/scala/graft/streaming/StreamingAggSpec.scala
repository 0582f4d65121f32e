package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.operators.IncrementalAgg

class StreamingAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("foreachBatch maintenance converges to the full recompute") {
    val stateDir = Files.createTempDirectory("graft_sagg").toString + "/state"
    val ckpt = Files.createTempDirectory("graft_sagg_ck").toString
    val specs = Seq(IncrementalAgg.Spec("v", Seq("sum", "max")))

    val input = MemoryStream[(String, Double)](spark)
    input.addData(("a", 1.0), ("b", 5.0))
    input.addData(("a", 2.5), ("c", -1.0))

    val q = StreamingAggMaintenance.run(
      input.toDF().toDF("k", "v"), stateDir, ckpt, Seq("k"), specs)
    q.awaitTermination()

    val st = StreamingAggMaintenance.currentState(spark, stateDir)
    assert(st.isDefined)
    val rows = st.get.orderBy("k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("rows"),
        r.getAs[Double]("v_sum"), r.getAs[Double]("v_max")))
    assert(rows.toSeq == Seq(("a", 2L, 3.5, 2.5), ("b", 1L, 5.0, 5.0),
      ("c", 1L, -1.0, -1.0)))

    // a second drain folds further batches into the SAME state
    input.addData(("b", 1.0))
    val q2 = StreamingAggMaintenance.run(
      input.toDF().toDF("k", "v"), stateDir, ckpt, Seq("k"), specs)
    q2.awaitTermination()
    val b = StreamingAggMaintenance.currentState(spark, stateDir).get
      .filter($"k" === "b").head()
    assert(b.getAs[Long]("rows") == 2 && b.getAs[Double]("v_sum") == 6.0)
  }
}
