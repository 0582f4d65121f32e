package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ClusteringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Three well-separated blobs around orthogonal axes, deterministic
    * small offsets. */
  private def blobs() = {
    val centers = Seq(
      Array(10.0, 0.0, 0.0, 0.0),
      Array(0.0, 10.0, 0.0, 0.0),
      Array(0.0, 0.0, 10.0, 0.0))
    val rows = for {
      b <- centers.indices
      i <- 0 until 30
    } yield {
      val off = (i % 5) * 0.1
      val v = centers(b).clone()
      v(3) = off
      (b.toLong * 100 + i, v.toSeq.map(_.toFloat), b)
    }
    rows.toDF("vec_id", "embedding", "true_blob")
  }

  test("k-means recovers separable blobs with pure clusters") {
    val df = blobs()
    val assigned = Clustering.assign(df, "vec_id", "embedding", k = 3, iters = 4)
      .join(df.select("vec_id", "true_blob"), "vec_id")
    val purity = assigned.groupBy("true_blob", "cluster_id").count()
      .collect()
    // each true blob maps to exactly one cluster and vice versa
    assert(purity.length == 3, purity.mkString(", "))
    assert(purity.map(_.getLong(2)).forall(_ == 30))
    assert(purity.map(_.getAs[Int]("cluster_id")).distinct.length == 3)
  }

  test("cluster stats report sizes, shares, and tight within-cluster scatter") {
    val df = blobs()
    val assigned = Clustering.assign(df, "vec_id", "embedding", k = 3, iters = 4)
    val stats = Clustering.stats(assigned).collect()
    assert(stats.length == 3)
    assert(stats.map(_.getAs[Long]("n_members")).sum == 90)
    stats.foreach { r =>
      assert(math.abs(r.getAs[Double]("share_pct") - 33.3333) < 0.01)
      // blob radius is 0.4 along one axis → scatter well under 1
      assert(r.getAs[Double]("avg_dist") < 1.0)
      assert(r.getAs[Double]("max_dist") < 1.0)
    }
  }
}
