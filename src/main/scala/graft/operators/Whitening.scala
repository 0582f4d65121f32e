package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X102 embedding whitening (Cholesky / "PCA-whitening" family) — the
  * standard pre-step before cosine-based retrieval and IVF clustering
  * when embedding dimensions are correlated: fit x ↦ W(x − μ) so the
  * transformed corpus has identity covariance. Public method: e.g. Su et
  * al., "Whitening Sentence Representations" (2021); classical ZCA/PCA
  * whitening otherwise.
  *
  * Scale shape mirrors the IVF trainer: the FIT is ONE distributed pass
  * that folds each partition into a fixed (1 + d + d²)-double moment
  * vector (count, Σx, Σxxᵀ) — `mapPartitions` + driver combine, the
  * established bounded-model-object pattern (the model is 33 KB at
  * d=64, like centroids or sketch registers; the corpus never shuffles).
  * The Cholesky factorization and triangular inverse run on the driver
  * (O(d³) on a d×d matrix — no cluster can help and none is needed).
  * The TRANSFORM is map-only: the model rides as a whole-stage-codegen
  * reference object ([[graft.expressions.WhitenExpr]], the VectorExprs
  * kernel convention) and each vector costs one O(d²) primitive
  * lower-triangular loop — no boxed UDF in the corpus-sized pass.
  *
  * Correctness is property-gated (WhiteningSpec): whitened sample
  * covariance == I within tolerance, distributed fit == single-pass
  * local fit exactly, and ε-regularization keeps rank-deficient inputs
  * finite. No SQL oracle: Cholesky is not reasonably SQL-recomputable —
  * same documented class as the IVF trainer.
  */
object Whitening {

  /** μ and the lower-triangular whitener W = L⁻¹ where Σ + εI = LLᵀ
    * (row-major d×d; entries above the diagonal are zero). */
  final case class Model(mean: Array[Double], w: Array[Array[Double]]) {
    def dim: Int = mean.length
    /** W packed row-major lower-triangular (row i at offset i(i+1)/2) —
      * the layout [[graft.expressions.WhitenKernels]] consumes. */
    def wPacked: Array[Double] = {
      val out = new Array[Double](dim * (dim + 1) / 2)
      var i = 0
      var base = 0
      while (i < dim) {
        System.arraycopy(w(i), 0, out, base, i + 1)
        base += i + 1
        i += 1
      }
      out
    }
    /** W(x − μ) for one vector. */
    def transform(x: Array[Double]): Array[Double] = {
      val d = dim
      val c = new Array[Double](d)
      var i = 0
      while (i < d) { c(i) = x(i) - mean(i); i += 1 }
      val out = new Array[Double](d)
      i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j <= i) { s += w(i)(j) * c(j); j += 1 }
        out(i) = s
        i += 1
      }
      out
    }
  }

  /** Fold a stream of vectors into (n, Σx, Σxxᵀ) — the single-pass
    * sufficient statistics. Exposed for the distributed==local test. */
  def moments(xs: Iterator[Array[Double]], d: Int): Array[Double] = {
    // layout: [n, sum(0..d-1), upper-tri xxT row-major (d*(d+1)/2)]
    val acc = new Array[Double](1 + d + d * (d + 1) / 2)
    xs.foreach { x =>
      require(x.length == d, s"expected dim $d, got ${x.length}")
      acc(0) += 1
      var i = 0
      while (i < d) { acc(1 + i) += x(i); i += 1 }
      var k = 1 + d
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { acc(k) += x(i) * x(j); j += 1; k += 1 }
        i += 1
      }
    }
    acc
  }

  private def combine(a: Array[Double], b: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
    out
  }

  /** (μ, Σ) from accumulated moments: Σ = E[xxᵀ] − μμᵀ. Shared by the
    * whitening and PCA fits (both are one moment pass + driver algebra). */
  def meanCov(acc: Array[Double], d: Int): (Array[Double], Array[Array[Double]]) = {
    val n = acc(0)
    require(n > 1, s"moment fit needs more than one vector, got ${n.toLong}")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var k = 1 + d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = acc(k) / n - mean(i) * mean(j)
        cov(i)(j) = v; cov(j)(i) = v
        j += 1; k += 1
      }
      i += 1
    }
    (mean, cov)
  }

  /** Model from accumulated moments: Σ = E[xxᵀ] − μμᵀ, then W = chol(Σ
    * + εI)⁻¹. Exposed for the distributed==local test. */
  def modelFromMoments(acc: Array[Double], d: Int, eps: Double): Model = {
    val (mean, cov) = meanCov(acc, d)
    var i = 0
    // Cholesky of cov + eps*I (in place into L, lower-triangular)
    val l = Array.ofDim[Double](d, d)
    i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = cov(i)(j) + (if (i == j) eps else 0.0)
        var m = 0
        while (m < j) { s -= l(i)(m) * l(j)(m); m += 1 }
        if (i == j) {
          require(s > 0, s"covariance + eps*I not positive definite at $i (raise eps)")
          l(i)(i) = math.sqrt(s)
        } else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    // forward-substitution inverse of L (also lower-triangular)
    val w = Array.ofDim[Double](d, d)
    i = 0
    while (i < d) {
      w(i)(i) = 1.0 / l(i)(i)
      var j = 0
      while (j < i) {
        var s = 0.0
        var m = j
        while (m < i) { s -= l(i)(m) * w(m)(j); m += 1 }
        w(i)(j) = s / l(i)(i)
        j += 1
      }
      i += 1
    }
    Model(mean, w)
  }

  /** One distributed pass over `vecCol` (array<float> or array<double>)
    * → whitening model. The dimension is discovered INSIDE the moment
    * pass (each partition reads it off its first vector; the reduce
    * cross-checks), so fitting is exactly one Spark job — no separate
    * `.first()` probe job ahead of it. */
  def fit(df: DataFrame, vecCol: Column, eps: Double = 1e-6): Model = {
    val (d, acc) = momentPass(df, vecCol)
    modelFromMoments(acc, d, eps)
  }

  /** The distributed moment pass by itself: (dim, accumulated moments).
    * Shared with [[Pca.fit]] — both models are pure functions of the same
    * sufficient statistics. */
  def momentPass(df: DataFrame, vecCol: Column): (Int, Array[Double]) = {
    import graft.functions.{VectorFunctions => VF}
    val vecs = df.select(VF.vecAsDouble(vecCol).as("_v")).filter(col("_v").isNotNull)
    try vecs.rdd.mapPartitions { rows =>
      val it = rows.map(_.getSeq[Double](0).toArray)
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val d = first.length
        Iterator.single((d, moments(Iterator.single(first) ++ it, d)))
      }
    }.reduce { (a, b) =>
      require(a._1 == b._1,
        s"moment fit: inconsistent vector dims ${a._1} vs ${b._1}")
      (a._1, combine(a._2, b._2))
    }
    catch { case _: UnsupportedOperationException => // reduce on empty RDD
      throw new IllegalArgumentException(
        "moment fit needs more than one vector, got 0")
    }
  }

  /** Map-only transform: appends `outCol` = W(x − μ) as array<double>
    * through the codegen'd [[graft.expressions.WhitenKernels]] primitive
    * loop (the model rides as a codegen reference object — ~d²/2 doubles,
    * KB-scale), bit-identical to [[Model.transform]]. NULL vectors map to
    * NULL, like every null-intolerant expression. */
  def transform(df: DataFrame, vecCol: Column, model: Model,
      outCol: String): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    df.withColumn(outCol, graft.expressions.VectorExprs.whiten_vec(
      VF.vecAsDouble(vecCol), model.mean, model.wPacked))
  }
}
