package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k SMALLEST child values (by the
  * child type's SQL ordering — struct children compare field-wise, so a
  * `struct(sort_key, tie_break, payload…)` child gives multi-key top-k)
  * and returns them sorted ascending as an array.
  *
  * This is the scale-shaped replacement for the
  * `row_number().over(Window.partitionBy(g)) <= k` idiom: the window
  * shuffles EVERY candidate row to its group's reducer before discarding
  * all but k, while this aggregate's partial buffers are size-capped, so
  * the shuffle carries at most k rows per (group × map partition). For a
  * brute-force kNN over an n-vector corpus that is |Q|·partitions·k
  * shuffled rows instead of |Q|·n — the difference between a bounded and
  * an unbounded shuffle at 100 TB. Runs under ObjectHashAggregateExec
  * (map-side combine preserved; sort-based fallback safe).
  *
  * Buffer: a size-k binary max-heap — O(log k) insert, O(1) reject of
  * rows ≥ the current k-th value, which is the common case once the heap
  * fills. Null child values are skipped (SQL aggregate convention). */
case class TopKMin(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKMin.Buffer] with UnaryLike[Expression] {

  require(k > 0, s"topk_min: k must be positive, got $k")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // serialize elements as single-field UnsafeRows (handles any child type)
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val readRow = new UnsafeRow(1)

  override def createAggregationBuffer(): TopKMin.Buffer = new TopKMin.Buffer(k)

  override def update(buf: TopKMin.Buffer, input: InternalRow): TopKMin.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v, ordering) // insert copies only when kept
    buf
  }

  override def merge(buf: TopKMin.Buffer, other: TopKMin.Buffer): TopKMin.Buffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.elem(i), ordering); i += 1 }
    buf
  }

  override def eval(buf: TopKMin.Buffer): Any =
    new GenericArrayData(buf.sorted(ordering))

  override def serialize(buf: TopKMin.Buffer): Array[Byte] = {
    val rows = new Array[Array[Byte]](buf.size)
    var total = 4
    var i = 0
    while (i < buf.size) {
      // copy() before getBytes: the projection's fixed-size result row
      // returns its SHARED buffer from getBytes, so without the copy all
      // k slots would alias the last-projected element
      rows(i) = proj(InternalRow(buf.elem(i))).copy().getBytes
      total += 4 + rows(i).length
      i += 1
    }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    rows.foreach { r => bb.putInt(r.length); bb.put(r) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKMin.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKMin.Buffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      readRow.pointTo(arr, len)
      buf.insert(InternalRow.copyValue(readRow.get(0, child.dataType)), ordering)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): TopKMin =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKMin =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TopKMin =
    copy(child = newChild)
  override def prettyName: String = "topk_min"
}

object TopKMin {

  /** Size-capped binary max-heap (root = largest kept value): accepts a
    * new value only when below capacity or smaller than the root. */
  final class Buffer(k: Int) {
    private val heap = new Array[Any](k)
    private var n = 0

    def size: Int = n
    def elem(i: Int): Any = heap(i)

    def insert(v: Any, ord: Ordering[Any]): Unit = {
      if (n < k) {
        heap(n) = InternalRow.copyValue(v)
        n += 1
        // sift up
        var i = n - 1
        while (i > 0 && ord.compare(heap((i - 1) / 2), heap(i)) < 0) {
          val p = (i - 1) / 2
          val t = heap(p); heap(p) = heap(i); heap(i) = t
          i = p
        }
      } else if (ord.compare(v, heap(0)) < 0) {
        heap(0) = InternalRow.copyValue(v)
        // sift down
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < n && ord.compare(heap(l), heap(m)) > 0) m = l
          if (r < n && ord.compare(heap(r), heap(m)) > 0) m = r
          if (m == i) done = true
          else {
            val t = heap(m); heap(m) = heap(i); heap(i) = t
            i = m
          }
        }
      }
    }

    def sorted(ord: Ordering[Any]): Array[Any] = {
      val out = java.util.Arrays.copyOf(heap.asInstanceOf[Array[AnyRef]], n)
      java.util.Arrays.sort(out, ord.asInstanceOf[Ordering[AnyRef]])
      out.asInstanceOf[Array[Any]]
    }
  }

  /** `topk_min(e, k)` as a Column aggregate. */
  def topkMin(e: Column, k: Int): Column =
    ColumnShim.column(TopKMin(ColumnShim.expression(e), k).toAggregateExpression())
}
