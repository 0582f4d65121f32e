package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join pre-filtering — the manual form of Spark's
  * AQE runtime row-level filter, for when the planner can't inject one
  * (non-equi pipelines, pre-shuffle dedup stages, reuse across several
  * downstream joins).
  *
  * The filter is BUILT DISTRIBUTED with Spark's own `bloom_filter_agg`
  * expression (one pass over the small side, partial-merged like any
  * agg), and only the finished ~numBits/8-byte sketch is collected — a
  * model object, not data. Applying it is a map-only codegen
  * `might_contain` on the big side, so most non-matching rows die before
  * the join's shuffle instead of after it. No false negatives: the join
  * result is exactly preserved; false positives only cost shuffle bytes
  * (~1% at the default sizing).
  */
object Bloom {

  /** Build a Bloom filter over `small(smallKey)`'s xxhash64 values and
    * return it as a binary payload. */
  def build(small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 1L << 23): Array[Byte] = {
    val agg = ColumnShim.column(
      new BloomFilterAggregate(
        ColumnShim.expression(xxhash64(col(smallKey))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    small.agg(agg.as("bf")).head().getAs[Array[Byte]]("bf")
  }

  /** `might_contain(filter, xxhash64(key))` as a Column. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnShim.column(BloomFilterMightContain(
      Literal.create(filter, BinaryType),
      ColumnShim.expression(xxhash64(key))))

  /** Drop big-side rows that cannot match any small-side key, BEFORE the
    * shuffle a subsequent join would pay. Exactly superset-preserving:
    * every joining row survives. */
  def semiJoinPrefilter(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 1L << 23): DataFrame = {
    val bf = build(small, smallKey, expectedItems, numBits)
    big.filter(mightContain(bf, col(bigKey)))
  }
}
