package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property gate for X118 PCA (no SQL oracle — the Jacobi
  * eigendecomposition is not reasonably SQL-recomputable; same documented
  * class as the whitening Cholesky): components orthonormal, projected
  * covariance diagonal == top-r eigenvalues, Σ eigenvalues == trace Σ,
  * distributed fit == single-pass local fit, the codegen kernel ==
  * driver-twin transform, and a hand-computed 2-d check. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Deterministic INTEGER-valued correlated 4-d corpus (integer data
    * keeps the distributed moment combine order-exact, the established
    * whitening-spec device). */
  private def corpus(n: Int): Seq[Array[Double]] = {
    def h(seed: Long): Long = {
      var x = seed * 0x9E3779B97F4A7C15L
      x ^= x >>> 29; x * 0xBF58476D1CE4E5B9L
    }
    (0 until n).map { i =>
      val z = Array.tabulate(4)(j => ((h(i * 4L + j + 1) >>> 40) % 9L).toDouble - 4.0)
      Array(
        2 * z(0),
        z(0) + z(1),
        -z(0) + z(2) + z(3),
        z(3))
    }
  }

  private def sampleCov(xs: Seq[Array[Double]]): Array[Array[Double]] = {
    val d = xs.head.length
    val n = xs.size.toDouble
    val mean = Array.tabulate(d)(i => xs.map(_(i)).sum / n)
    Array.tabulate(d, d)((i, j) =>
      xs.map(x => (x(i) - mean(i)) * (x(j) - mean(j))).sum / n)
  }

  test("jacobi matches a hand-computed 2-d eigensystem") {
    // [[5, 2], [2, 2]]: eigenvalues 6 and 1, vectors (2,1)/√5 and (−1,2)/√5
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(5.0, 2.0), Array(2.0, 2.0)))
    assert(math.abs(vals(0) - 6.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val s5 = math.sqrt(5.0)
    assert(math.abs(vecs(0)(0) - 2 / s5) < 1e-12 && math.abs(vecs(0)(1) - 1 / s5) < 1e-12,
      vecs(0).toSeq.toString)
    // sign convention: largest-|entry| positive → (−1,2)/√5 keeps +2
    assert(math.abs(vecs(1)(0) + 1 / s5) < 1e-12 && math.abs(vecs(1)(1) - 2 / s5) < 1e-12,
      vecs(1).toSeq.toString)
  }

  test("components are orthonormal; eigenvalue sum equals the covariance trace") {
    val xs = corpus(400)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val model = Pca.fit(df, col("vec"), r = 4)
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(t => model.components(i)(t) * model.components(j)(t)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<c$i, c$j> = $dot")
    }
    val cov = sampleCov(xs)
    val trace = (0 until 4).map(i => cov(i)(i)).sum
    assert(math.abs(model.eigenvalues.sum - trace) < 1e-6 * math.max(1.0, trace),
      s"Σλ=${model.eigenvalues.sum} trace=$trace")
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "λ not descending")
  }

  test("projected data has diagonal covariance equal to the top-r eigenvalues") {
    val xs = corpus(500)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val model = Pca.fit(df, col("vec"), r = 2)
    val projected = Pca.transform(df, col("vec"), model, "p")
      .select("p").collect().map(_.getSeq[Double](0).toArray).toSeq
    val pcov = sampleCov(projected)
    assert(math.abs(pcov(0)(0) - model.eigenvalues(0)) < 1e-6 * math.max(1.0, model.eigenvalues(0)))
    assert(math.abs(pcov(1)(1) - model.eigenvalues(1)) < 1e-6 * math.max(1.0, model.eigenvalues(1)))
    assert(math.abs(pcov(0)(1)) < 1e-6, s"projected cross-cov ${pcov(0)(1)}")
    // the projection keeps exactly the variance the model claims
    val tot = model.eigenvalues.sum
    val kept = (model.eigenvalues(0) + model.eigenvalues(1)) / tot
    assert(math.abs(model.varianceExplained - kept) < 1e-12)
  }

  test("distributed fit equals the single-pass local fit exactly on integer data") {
    val xs = corpus(300)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
      .repartition(7)
    val distributed = Pca.fit(df, col("vec"), r = 3)
    val localAcc = Whitening.moments(xs.iterator, 4)
    val local = Pca.modelFromMoments(localAcc, 4, 3)
    assert(distributed.mean.toSeq == local.mean.toSeq)
    assert(distributed.eigenvalues.toSeq == local.eigenvalues.toSeq)
    for (i <- 0 until 3)
      assert(distributed.components(i).toSeq == local.components(i).toSeq, s"component $i")
  }

  test("the codegen kernel agrees with the driver-twin transform bit-for-bit") {
    val xs = corpus(100)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val model = Pca.fit(df, col("vec"), r = 2)
    val viaKernel = Pca.transform(df, col("vec"), model, "p")
      .orderBy("id").select("p").collect().map(_.getSeq[Double](0).toArray)
    xs.zip(viaKernel).foreach { case (x, k) =>
      assert(java.util.Arrays.equals(model.transform(x), k))
    }
    // NULL vectors map to NULL
    val withNull = Seq((0L, Array(1.0, 2.0, 3.0, 4.0)), (1L, null))
      .toDF("id", "vec")
    val out = Pca.transform(withNull, col("vec"), model, "p")
      .orderBy("id").select("p").collect()
    assert(out(0).getSeq[Double](0) != null && out(1).isNullAt(0))
  }

  test("whiten → PCA composes into ONE affine map: stage-wise equals the composed transform") {
    // the PCAR,PQ index chain applies whiten then project per row; at
    // 100 TB one would fold both into a single r×d matrix — this pins
    // that the fold is exact: P(W(x−μw) − μp) == (P·W)(x−μw) − P·μp
    val xs = corpus(300)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val wModel = Whitening.fit(df, col("vec"))
    val whitened = Whitening.transform(df, col("vec"), wModel, "w")
    val pModel = Pca.fit(whitened, col("w"), r = 2)
    val d = 4
    // probe W's columns black-box: W·e_i = wTransform(μw + e_i)
    val wCols = Array.tabulate(d) { i =>
      val probe = wModel.mean.clone(); probe(i) += 1.0
      wModel.transform(probe)
    }
    val m = Array.tabulate(pModel.r, d)((r0, c) =>
      (0 until d).map(t => pModel.components(r0)(t) * wCols(c)(t)).sum)
    val o = Array.tabulate(pModel.r)(r0 =>
      (0 until d).map(t => pModel.components(r0)(t) * pModel.mean(t)).sum)
    xs.take(50).foreach { x =>
      val stagewise = pModel.transform(wModel.transform(x))
      val composed = Array.tabulate(pModel.r) { r0 =>
        (0 until d).map(t => m(r0)(t) * (x(t) - wModel.mean(t))).sum - o(r0)
      }
      for (t <- 0 until pModel.r)
        assert(math.abs(stagewise(t) - composed(t)) < 1e-9,
          s"dim $t: stage-wise ${stagewise(t)} vs composed ${composed(t)}")
    }
  }

  test("rank bounds are refused") {
    val df = corpus(50).zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")
    val e = intercept[IllegalArgumentException] { Pca.fit(df, col("vec"), r = 5) }
    assert(e.getMessage.contains("rank r"))
    val e2 = intercept[IllegalArgumentException] { Pca.fit(df, col("vec"), r = 0) }
    assert(e2.getMessage.contains("rank r"))
  }
}
