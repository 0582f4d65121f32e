package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property gate for X102 whitening (no SQL oracle — Cholesky is not
  * reasonably SQL-recomputable, same documented class as the IVF
  * trainer): whitened sample covariance must be I, the distributed fit
  * must equal the single-pass local fit, and ε must keep rank-deficient
  * inputs finite. */
class WhiteningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic correlated 4-d vectors: z ~ hash-uniform, x = A z,
    * so cov(x) = A Aᵀ is decidedly non-identity. */
  private def corpus(n: Int): Seq[Array[Double]] = {
    def u(seed: Long): Double = {
      val h = seed * 0x9E3779B97F4A7C15L
      ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val a = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.8, 0.6, 0.0, 0.0),
      Array(-0.5, 0.3, 1.2, 0.0),
      Array(0.1, -0.7, 0.4, 0.9))
    (0 until n).map { i =>
      val z = Array.tabulate(4)(j => u(i * 4L + j + 1))
      Array.tabulate(4)(r => (0 until 4).map(c => a(r)(c) * z(c)).sum)
    }
  }

  private def sampleCov(xs: Seq[Array[Double]]): Array[Array[Double]] = {
    val d = xs.head.length
    val n = xs.size.toDouble
    val mean = Array.tabulate(d)(i => xs.map(_(i)).sum / n)
    Array.tabulate(d, d)((i, j) =>
      xs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n)
  }

  test("whitened sample covariance is the identity; mean is zero") {
    val data = corpus(4000)
    val df = data.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    val model = Whitening.fit(df, col("embedding"))
    val out = Whitening.transform(df, col("embedding"), model, "w")
      .select("w").collect().map(_.getSeq[Double](0).toArray).toSeq
    val cov = sampleCov(out)
    for (i <- 0 until 4; j <- 0 until 4) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov(i)(j) - want) < 2e-2,
        s"cov($i,$j) = ${cov(i)(j)}, want $want")
    }
    val mean = Array.tabulate(4)(i => out.map(_(i)).sum / out.size)
    assert(mean.forall(m => math.abs(m) < 1e-9), mean.mkString(","))
  }

  test("distributed fit equals the single-pass local fit") {
    val data = corpus(500)
    val df = data.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding").repartition(13)
    val dist = Whitening.fit(df, col("embedding"))
    val local = Whitening.modelFromMoments(
      Whitening.moments(data.iterator, 4), 4, eps = 1e-6)
    assert(dist.mean.zip(local.mean).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    for (i <- 0 until 4; j <- 0 to i)
      assert(math.abs(dist.w(i)(j) - local.w(i)(j)) < 1e-9, s"w($i)($j)")
  }

  test("rank-deficient input stays finite through the eps ridge") {
    // dim 2 is a copy of dim 0: covariance is singular without the ridge
    val data = corpus(300).map(v => Array(v(0), v(1), v(0)))
    val model = Whitening.modelFromMoments(
      Whitening.moments(data.iterator, 3), 3, eps = 1e-4)
    val out = data.map(model.transform)
    assert(out.flatten.forall(v => !v.isNaN && !v.isInfinite))
    // and the duplicated direction collapses to ~zero variance, not garbage
    val cov = sampleCov(out)
    assert(cov(0)(0) > 0.5 && cov(1)(1) > 0.5)
  }

  test("fit rejects single-row and empty inputs with a clear error") {
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](Whitening.fit(df, col("embedding")))
    assert(e.getMessage.contains("more than one vector"))
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException](Whitening.fit(empty, col("embedding")))
    assert(e2.getMessage.contains("more than one vector"))
  }

  test("codegen kernel transform is bit-identical to Model.transform; NULL vectors stay NULL") {
    val data = corpus(200)
    val model = Whitening.modelFromMoments(
      Whitening.moments(data.iterator, 4), 4, eps = 1e-6)
    val rows = data.zipWithIndex.map { case (v, i) => (i.toLong, Option(v.toSeq)) } :+
      (999L, Option.empty[Seq[Double]])
    val df = rows.toDF("vec_id", "embedding")
    val out = Whitening.transform(df, col("embedding"), model, "w")
      .select("vec_id", "w").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_ =>
        r.getSeq[Double](1).toArray)).toMap
    assert(out(999L).isEmpty)
    data.zipWithIndex.foreach { case (v, i) =>
      val want = model.transform(v)
      val got = out(i.toLong).get
      // EXACT equality: the packed kernel accumulates in the same
      // j-ascending order as the driver-side reference
      assert(got.sameElements(want), s"row $i")
    }
  }

  test("packed model layout matches the triangular rows") {
    val data = corpus(100)
    val m = Whitening.modelFromMoments(
      Whitening.moments(data.iterator, 4), 4, eps = 1e-6)
    val p = m.wPacked
    for (i <- 0 until 4; j <- 0 to i)
      assert(p(i * (i + 1) / 2 + j) == m.w(i)(j), s"($i,$j)")
  }
}
