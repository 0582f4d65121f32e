package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, StructField, StructType}

/** Codegen kernels for product quantization (Jégou, Douze & Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011 — the
  * IVFADC method FAISS ships as `IndexIVFPQ`; reference counterpart:
  * src/lakehouse/indexing/faiss_builder.py trains FAISS indexes in one
  * process, this splits the same math into Spark map passes).
  *
  * All three kernels follow the VectorExprs convention: the model
  * (codebooks, ~m·k·dsub doubles = 128 KB at d=64/m=8/k=256) rides as a
  * whole-stage-codegen reference object; each row costs one tight
  * primitive loop; no boxed UDF, no crossJoin against a codebook table.
  *
  * Codes are stored OFFSET-SHIFTED: code c ∈ [0, k) is persisted as the
  * signed byte (c − 128), so k = 256 exactly fills the byte range and
  * parquet stores m bytes per vector (32× smaller than the float32
  * vector it replaces at d=64/m=8).
  */
object PqKernels {

  /** Per-subspace nearest-centroid encode of the RESIDUAL (v − coarse):
    * returns (codes: Array[Byte] of length m, ‖coarse + v̂res‖ — the
    * reconstructed norm ADC ranking divides by, so search is exactly
    * consistent with what the codes reconstruct). `coarse` may be an
    * empty array for flat (non-IVF) PQ — treated as the zero vector.
    * Ties break to the LOWEST code, strict `<` on squared L2. */
  def encode(v: ArrayData, coarse: Array[Double],
      cb: Array[Array[Array[Double]]]): InternalRow = {
    val m = cb.length
    val dsub = if (m > 0) cb(0)(0).length else 0
    val d = m * dsub
    if (v.numElements() != d)
      throw new IllegalArgumentException(
        s"pq_encode: expected dim $d (m=$m × dsub=$dsub), got ${v.numElements()}")
    val codes = new Array[Byte](m)
    val recon = new Array[Double](d)
    var j = 0
    while (j < m) {
      val base = j * dsub
      val book = cb(j)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var t = 0
        while (t < dsub) {
          val x = v.getDouble(base + t) -
            (if (coarse.length > base + t) coarse(base + t) else 0.0)
          val diff = x - cent(t)
          acc += diff * diff
          t += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      codes(j) = (best - 128).toByte
      val cent = book(best)
      var t = 0
      while (t < dsub) {
        recon(base + t) = cent(t) +
          (if (coarse.length > base + t) coarse(base + t) else 0.0)
        t += 1
      }
      j += 1
    }
    var nn = 0.0
    var i = 0
    while (i < d) { nn += recon(i) * recon(i); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](codes, math.sqrt(nn)))
  }

  /** Asymmetric-distance lookup table for one query: lut[j·k + c] =
    * dot(q_j, cb[j][c]) over the subspace slice q_j. Computed ONCE per
    * query (m·k·dsub = k·d multiplies), after which every candidate costs
    * m lookups instead of d multiplies. For residual (IVF) codebooks the
    * table is cell-independent — dot(q, coarse_cell) is a separate
    * per-(query, probed-cell) scalar the caller adds. */
  def lut(q: ArrayData, cb: Array[Array[Array[Double]]], k: Int): ArrayData = {
    val m = cb.length
    val dsub = if (m > 0) cb(0)(0).length else 0
    val d = m * dsub
    if (q.numElements() != d)
      throw new IllegalArgumentException(
        s"pq_lut: expected dim $d (m=$m × dsub=$dsub), got ${q.numElements()}")
    val out = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val base = j * dsub
      val book = cb(j)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var acc = 0.0
        var t = 0
        while (t < dsub) { acc += q.getDouble(base + t) * cent(t); t += 1 }
        out(j * k + c) = acc
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC accumulation: Σ_j lut[j·k + (codes[j] + 128)] ≈ dot(q, v̂res).
    * m additions + m array reads per candidate — the entire point of PQ:
    * the d-dim dot never happens in the candidate loop. */
  def adc(lut: ArrayData, codes: Array[Byte], k: Int): Double = {
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      acc += lut.getDouble(j * k + (codes(j) + 128))
      j += 1
    }
    acc
  }
}

/** codes + reconstructed norm of a double-array vector column against
  * (coarse centroid per row via `cellPos` into `coarseCents`, PQ
  * codebooks). `cellPos` = −1 encodes flat PQ (zero coarse). */
case class PqEncodeExpr(left: Expression, right: Expression,
    coarseCents: Array[Array[Double]], cb: Array[Array[Array[Double]]])
    extends BinaryExpression {
  private val empty = new Array[Double](0)
  override def dataType: DataType = StructType(Seq(
    StructField("codes", BinaryType, nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))
  override def nullSafeEval(v: Any, pos: Any): Any = {
    val p = pos.asInstanceOf[Int]
    PqKernels.encode(v.asInstanceOf[ArrayData],
      if (p >= 0) coarseCents(p) else empty, cb)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarse", coarseCents, "double[][]")
    val bRef = ctx.addReferenceObj("cb", cb, "double[][][]")
    nullSafeCodeGen(ctx, ev, (v, p) => s"""
       |${ev.value} = graft.expressions.PqKernels.encode($v,
       |  ($p >= 0) ? $cRef[$p] : new double[0], $bRef);
     """.stripMargin)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Per-query ADC lookup table (array<double> of m·k) — see
  * [[PqKernels.lut]]. Applied BEFORE any probe fan-out so the k·d work
  * happens once per query, not once per (query, cell). */
case class PqLutExpr(child: Expression, cb: Array[Array[Array[Double]]], k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(q: Any): Any =
    PqKernels.lut(q.asInstanceOf[ArrayData], cb, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("cb", cb, "double[][][]")
    defineCodeGen(ctx, ev, q => s"graft.expressions.PqKernels.lut($q, $bRef, $k)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** ADC sum of a codes column against a per-row LUT column — the
  * candidate-loop kernel; see [[PqKernels.adc]]. */
case class PqAdcExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(lut: Any, codes: Any): Any =
    PqKernels.adc(lut.asInstanceOf[ArrayData], codes.asInstanceOf[Array[Byte]], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, c) => s"graft.expressions.PqKernels.adc($l, $c, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object PqExprs {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Encode a vector column: struct(codes binary, rnorm double). Eager
    * Column wrapping for the same reason as VectorExprs.nearest_cell. */
  def pq_encode(v: Column, cellPos: Column, coarseCents: Array[Array[Double]],
      cb: Array[Array[Array[Double]]]): Column =
    ColumnShim.column(PqEncodeExpr(ColumnShim.expression(v),
      ColumnShim.expression(cellPos), coarseCents, cb))

  def pq_lut(q: Column, cb: Array[Array[Array[Double]]], k: Int): Column =
    ColumnShim.column(PqLutExpr(ColumnShim.expression(q), cb, k))

  def pq_adc(lut: Column, codes: Column, k: Int): Column =
    ColumnShim.column(PqAdcExpr(ColumnShim.expression(lut),
      ColumnShim.expression(codes), k))
}
