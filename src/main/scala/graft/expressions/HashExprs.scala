package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernels shared by interpreted eval and generated code (the
  * generated Java calls these as static methods — no lambda interpretation,
  * no virtual dispatch in the loop). */
object HashKernels {
  final val PolyMod = 1000000007L
  final val PolyMul = 131L

  /** Polynomial fold over Unicode code points — same value as
    * graft.functions.Hashes.polyHash's HOF formulation. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * PolyMul + cp) % PolyMod
      i += Character.charCount(cp)
    }
    acc
  }

  /** The independent second factor (mul 137, mod 998244353) — same value
    * as graft.functions.Hashes.polyHash2's HOF formulation. */
  def polyHash2(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * graft.functions.Hashes.PolyMul2 + cp) %
        graft.functions.Hashes.PolyMod2
      i += Character.charCount(cp)
    }
    acc
  }

  /** polyHash per element of an array<string>. */
  def polyHashArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = polyHash(arr.getUTF8String(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Rolling positional k-gram hashes over an array<long> of token
    * hashes: out(i) = fold of hs[i..i+k-1] under acc·mul + h (mod p) —
    * the Rabin–Karp rolling-window device. out(0) folds the first window
    * directly; each subsequent window drops the leading term
    * (hs[i]·mul^(k−1)) and shifts, so the whole chain is O(n) long ops
    * regardless of k, with no per-window slice allocation. Identical
    * values to the naive per-window fold (which is what the SQL oracle
    * replays via list_reduce over slices). Empty output when n < k. */
  def gramChain(hs: ArrayData, k: Int, mul: Long): ArrayData = {
    val n = hs.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    // mul^(k-1) mod p — the weight of a window's leading token
    var mk = 1L
    var e = 0
    while (e < k - 1) { mk = (mk * mul) % PolyMod; e += 1 }
    val out = new Array[Long](n - k + 1)
    var acc = 0L
    var j = 0
    while (j < k) { acc = (acc * mul + hs.getLong(j)) % PolyMod; j += 1 }
    out(0) = acc
    var i = 1
    while (i <= n - k) {
      var t = (acc - (hs.getLong(i - 1) * mk) % PolyMod) % PolyMod
      if (t < 0) t += PolyMod
      acc = (t * mul + hs.getLong(i + k - 1)) % PolyMod
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** k minhash slots in one pass: slot_i = min over hs of (a_i·h + b_i) % p. */
  def minhashSlots(hs: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (h * a(i) + b(i)) % PolyMod
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    if (n == 0) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(out.map(Long.box(_): Any))
  }

  /** SimHash fold over an array<long> of base hashes: bit i of the result
    * is set iff Σ_h (bit i of h ? +1 : −1) > 0. One pass over the hashes —
    * the HOF formulation interprets `bits` aggregate lambdas per row. */
  def simhashBits(hs: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < bits) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  /** |A ∩ B| for two ASCENDING-sorted long arrays (two-pointer merge). */
  def sortedIntersectCount(x: ArrayData, y: ArrayData): Long = {
    var i = 0; var j = 0; var c = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val a = x.getLong(i); val b = y.getLong(j)
      if (a == b) { c += 1; i += 1; j += 1 }
      else if (a < b) i += 1
      else j += 1
    }
    c
  }

  /** Count of `needles` members present in the ASCENDING-sorted
    * `haystack` — binary search per needle, O(n·log m), for the
    * asymmetric case [[sortedIntersectCount]]'s two-pointer merge
    * handles badly: probing per-doc gram sets (tens-hundreds of hashes)
    * against one benchmark-sized array (10⁴-10⁶ hashes) must not walk
    * the whole haystack per row. Needles sorted ascending too, so the
    * search window's low bound only moves forward (duplicate needles,
    * possible only via hash collision, each count like the merge
    * would). */
  def sortedMemberCount(needles: ArrayData, haystack: ArrayData): Long = {
    val n = needles.numElements(); val m = haystack.numElements()
    var c = 0L
    var lo0 = 0
    var i = 0
    while (i < n && lo0 < m) {
      val v = needles.getLong(i)
      var lo = lo0; var hi = m // search [lo, hi)
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (haystack.getLong(mid) < v) lo = mid + 1 else hi = mid
      }
      if (lo < m && haystack.getLong(lo) == v) { c += 1; lo0 = lo + 1 }
      else lo0 = lo
      i += 1
    }
    c
  }
}

/** polyHash as a codegen-friendly expression (the `aggregate` HOF version
  * interprets a lambda per character; this is one static call per row). */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashKernels.polyHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.polyHash($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** The 137/998244353 second-factor fold (packed-fingerprint partner of
  * [[PolyHashExpr]]). */
case class PolyHash2Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashKernels.polyHash2(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.polyHash2($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Elementwise polyHash over an array<string> column. */
case class PolyHashArrayExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashKernels.polyHashArray(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.polyHashArray($c)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** One-pass k-slot minhash signature over an array<long> of base hashes. */
case class MinhashSlotsExpr(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashKernels.minhashSlots(v.asInstanceOf[ArrayData], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.minhashSlots($c, $aRef, $bRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Rolling k-gram hash chain over an array<long> of token hashes. */
case class GramChainExpr(child: Expression, k: Int, mul: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    HashKernels.gramChain(v.asInstanceOf[ArrayData], k, mul)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.gramChain($c, $k, ${mul}L)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** One-pass SimHash fingerprint over an array<long> of base hashes. */
case class SimhashBitsExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashKernels.simhashBits(v.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.simhashBits($c, $bits)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Intersection size of two sorted array<long> columns — the fast exact
  * set-overlap primitive behind n-gram Jaccard at scale. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    HashKernels.sortedIntersectCount(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.HashKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Count of left's members present in the sorted right array — the
  * binary-search sibling of [[SortedIntersectCountExpr]] for
  * needle ≪ haystack cardinalities (decontamination probes). */
case class SortedMemberCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    HashKernels.sortedMemberCount(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.HashKernels.sortedMemberCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Shared helpers for temp-function builders. */
object ExprArgs {
  /** Evaluate a plan-time-constant integer argument. Accepts any foldable
    * integral expression (SQL callers may pass BIGINT literals, DuckDB
    * style); rejects non-foldable args with a clear error instead of
    * evaluating against a null input row. */
  def litInt(e: Expression, fn: String): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: argument must be a constant integer, got ${e.sql}")
    e.eval() match {
      case i: Int   => i
      case l: Long  => l.toInt
      case s: Short => s.toInt
      case b: Byte  => b.toInt
      case other =>
        throw new IllegalArgumentException(s"$fn: argument must be an integer, got $other")
    }
  }
}

object HashFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_poly_hash", e => PolyHashExpr(e.head), "built-in")
    reg.createOrReplaceTempFunction("graft_poly_hash_array", e => PolyHashArrayExpr(e.head), "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_intersect_count",
      e => SortedIntersectCountExpr(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_member_count",
      e => SortedMemberCountExpr(e(0), e(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash_bits",
      e => SimhashBitsExpr(e(0), ExprArgs.litInt(e(1), "graft_simhash_bits")), "built-in")
    reg.createOrReplaceTempFunction("graft_gram_chain",
      e => GramChainExpr(e(0), ExprArgs.litInt(e(1), "graft_gram_chain"),
        graft.functions.Hashes.SpanGramMul), "built-in")
  }

  def registerMinhash(spark: SparkSession, name: String, a: Array[Long], b: Array[Long]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, e => MinhashSlotsExpr(e.head, a, b), "built-in")

  def poly_hash(c: Column): Column = call_function("graft_poly_hash", c)
  def poly_hash_array(c: Column): Column = call_function("graft_poly_hash_array", c)
  def sorted_intersect_count(a: Column, b: Column): Column =
    call_function("graft_sorted_intersect_count", a, b)
  def sorted_member_count(needles: Column, haystack: Column): Column =
    call_function("graft_sorted_member_count", needles, haystack)
  def simhash_bits(hs: Column, bits: Int): Column =
    call_function("graft_simhash_bits", hs, org.apache.spark.sql.functions.lit(bits))
  def gram_chain(hs: Column, k: Int): Column =
    call_function("graft_gram_chain", hs, org.apache.spark.sql.functions.lit(k))
}
