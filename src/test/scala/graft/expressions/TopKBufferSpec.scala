package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM checks of the size-capped heap (no Spark job). */
class TopKBufferSpec extends AnyFunSuite {
  private val structType = StructType(Seq(
    StructField("ns", DoubleType), StructField("nid", LongType)))
  private val ord = TypeUtils.getInterpretedOrdering(structType)

  private def row(ns: Double, nid: Long): InternalRow = InternalRow(ns, nid)

  test("keeps the k smallest, sorted ascending") {
    val buf = new TopKMin.Buffer(3)
    val values = Seq(5.0, 1.0, 4.0, 2.0, 3.0, 0.5, 6.0)
    values.zipWithIndex.foreach { case (v, i) => buf.insert(row(v, i.toLong), ord) }
    val out = buf.sorted(ord).map(_.asInstanceOf[InternalRow])
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq == Seq((0.5, 5L), (1.0, 1L), (2.0, 3L)))
  }

  test("descending stream (each new element is the new best)") {
    val buf = new TopKMin.Buffer(3)
    (0 until 10).foreach(i => buf.insert(row(10.0 - i, i.toLong), ord))
    val out = buf.sorted(ord).map(_.asInstanceOf[InternalRow]).map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("serialize/deserialize round-trips distinct elements") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    val agg = TopKMin(BoundReference(0, structType, nullable = true), 3)
    var buf = agg.createAggregationBuffer()
    Seq(5.0, 1.0, 4.0, 2.0).zipWithIndex.foreach { case (v, i) =>
      buf = agg.update(buf, InternalRow(row(v, i.toLong)))
    }
    val back = agg.deserialize(agg.serialize(buf))
    val out = back.sorted(ord).map(_.asInstanceOf[InternalRow])
      .map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq == Seq((1.0, 1L), (2.0, 3L), (4.0, 2L)))
  }

  test("reused input row instance does not alias heap entries") {
    val buf = new TopKMin.Buffer(3)
    val reused = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    (0 until 10).foreach { i =>
      reused.update(0, 10.0 - i)
      reused.update(1, i.toLong)
      buf.insert(reused, ord)
    }
    val out = buf.sorted(ord).map(_.asInstanceOf[InternalRow]).map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 2.0, 3.0))
  }
}
