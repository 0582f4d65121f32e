package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** X118 PCA projection (classical principal component analysis — the
  * standard embedding-compression / decorrelation step a curation
  * pipeline runs before storing or indexing vectors when the encoder's
  * dimensions are redundant; Su et al. 2021 pair it with whitening for
  * retrieval, FAISS ships it as `PCAMatrix` for exactly this use).
  *
  * Scale shape — identical to [[Whitening]], whose sufficient statistics
  * it shares: the FIT is the SAME single distributed moment pass
  * ([[Whitening.momentPass]] — (1 + d + d²) doubles per partition, the
  * corpus never shuffles), and the eigendecomposition is cyclic Jacobi
  * on the d×d covariance on the driver (O(d³) per sweep on a KB-scale
  * matrix — no cluster can help and none is needed). The TRANSFORM is
  * map-only through the codegen'd dense-projection kernel
  * ([[graft.expressions.ProjectExpr]] — one O(r·d) primitive loop per
  * row, the model rides as a reference object, no boxed UDF).
  *
  * Why PCA beside whitening and PQ: whitening (X102) decorrelates at
  * FULL dimension; PQ (X117) compresses to bytes but needs codebook
  * training per corpus. PCA is the in-between — keep r ≪ d float dims
  * with a provable variance bound (variance kept = Σ top-r eigenvalues /
  * trace Σ, reported by [[Model.varianceExplained]]), storage and every
  * downstream kernel get d/r× cheaper, and the projection composes with
  * both (PCA→PQ is FAISS's stock `PCAR,PQm` preprocessing chain).
  *
  * No SQL oracle: the eigendecomposition is not reasonably
  * SQL-recomputable — same documented class as the IVF/PQ trainers and
  * the whitening Cholesky. Correctness is property-gated (PcaSpec):
  * components orthonormal, projected covariance == diag(top-r
  * eigenvalues), Σ eigenvalues == trace Σ, distributed fit == local fit,
  * kernel == driver-twin transform, hand-computed 2-d check.
  */
object Pca {

  /** μ, the full eigen spectrum (descending), and the top-r components
    * (rows, orthonormal). Bounded model object: d + d + r·d doubles. */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def dim: Int = mean.length
    def r: Int = components.length
    /** Σ top-r eigenvalues / Σ all — the fraction of corpus variance the
      * projection keeps (exact over the fitted corpus, no sampling). */
    def varianceExplained: Double = {
      val tot = eigenvalues.sum
      if (tot <= 0) 1.0 else eigenvalues.take(r).sum / tot
    }
    /** Components packed row-major for the codegen kernel. */
    def pFlat: Array[Double] = {
      val d = dim
      val out = new Array[Double](r * d)
      var i = 0
      while (i < r) { System.arraycopy(components(i), 0, out, i * d, d); i += 1 }
      out
    }
    /** P(x − μ) for one vector — the driver twin of
      * [[graft.expressions.ProjectKernels.project]]. */
    def transform(x: Array[Double]): Array[Double] = {
      val d = dim
      val c = new Array[Double](d)
      var j = 0
      while (j < d) { c(j) = x(j) - mean(j); j += 1 }
      val out = new Array[Double](r)
      var i = 0
      while (i < r) {
        var s = 0.0
        var jj = 0
        while (jj < d) { s += components(i)(jj) * c(jj); jj += 1 }
        out(i) = s
        i += 1
      }
      out
    }
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (in-place on
    * a copy): returns (eigenvalues, eigenvectors as ROWS), sorted by
    * eigenvalue descending, ties by original index. Deterministic: fixed
    * sweep order, fixed sweep count bound, sign fixed so each vector's
    * largest-|entry| component is positive (first on ties). Classical
    * algorithm (Golub & Van Loan §8.5) — O(d³) per sweep, converges
    * quadratically; 30 sweeps is far beyond what d ≤ a few hundred
    * needs. */
  def jacobiEigen(sym: Array[Array[Double]], maxSweeps: Int = 30,
      tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val a = Array.tabulate(d, d)((i, j) => sym(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val frob = math.max(1e-300, math.sqrt(
      a.map(_.map(x => x * x).sum).sum))
    while (sweep < maxSweeps && off > tol * frob) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // standard stable rotation choice
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(if (theta == 0) 1.0 else theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // sort (value desc, index asc); eigenvectors are v's COLUMNS
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      // deterministic sign: largest-|entry| component positive
      var am = 0
      var r = 1
      while (r < d) { if (math.abs(col(r)) > math.abs(col(am))) am = r; r += 1 }
      if (col(am) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += 2.0 * a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Model from accumulated moments — exposed for the distributed==local
    * test (the [[Whitening.modelFromMoments]] convention). */
  def modelFromMoments(acc: Array[Double], d: Int, r: Int): Model = {
    require(r >= 1 && r <= d, s"pca: rank r must be in [1, $d], got $r")
    val (mean, cov) = Whitening.meanCov(acc, d)
    val (values, vectors) = jacobiEigen(cov)
    Model(mean, values, vectors.take(r))
  }

  /** One distributed moment pass → rank-r PCA model. */
  def fit(df: DataFrame, vecCol: Column, r: Int): Model = {
    val (d, acc) = Whitening.momentPass(df, vecCol)
    modelFromMoments(acc, d, r)
  }

  /** Map-only transform: appends `outCol` = P(x − μ) as array<double>
    * (length r) through the codegen'd dense-projection kernel —
    * bit-identical to [[Model.transform]]. NULL vectors map to NULL. */
  def transform(df: DataFrame, vecCol: Column, model: Model,
      outCol: String): DataFrame = {
    import graft.functions.{VectorFunctions => VF}
    df.withColumn(outCol, graft.expressions.VectorExprs.project_vec(
      VF.vecAsDouble(vecCol), model.mean, model.pFlat, model.r))
  }
}
