package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping —
  * the OPTIMIZE ZORDER BY idea (public: Delta/Iceberg docs, Morton 1966).
  *
  * Range-packing on one sort key (what [[Layout.compact]] does) makes
  * parquet row-group min/max stats selective for THAT key and useless
  * for every other predicate column. Interleaving the bits of several
  * columns' rank codes puts rows that are close in ANY of the columns
  * into the same files, so a scan filtered on x, on y, or on both skips
  * most row groups from footer stats alone — at 100 TB, data you never
  * read is the cheapest data there is.
  *
  * Everything here is one narrow map expression (codegen'd bit math) plus
  * the same repartitionByRange + sortWithinPartitions shuffle a plain
  * sorted write already pays; min/max normalization bounds come from one
  * cheap agg. Numeric columns get true range locality; string columns
  * hash into the code space (equality-skipping only — a string's
  * neighbors are its duplicates, which is what dedup-heavy layouts
  * filter by anyway).
  */
object ZOrder {

  /** Bits per column; 3 cols × 16 bits stay well inside a long. */
  val DefaultBits = 16

  /** Normalized [0, 2^bits) rank code for one column given its min/max. */
  private def code(c: Column, dt: org.apache.spark.sql.types.DataType,
      minV: Option[Double], maxV: Option[Double], bits: Int): Column = {
    import org.apache.spark.sql.types._
    val top = (1L << bits) - 1
    dt match {
      case _: NumericType =>
        (minV, maxV) match {
          case (Some(lo), Some(hi)) if hi > lo =>
            val scaled = (c.cast("double") - lit(lo)) / lit(hi - lo) * lit(top.toDouble)
            coalesce(least(greatest(floor(scaled).cast("long"), lit(0L)), lit(top)), lit(0L))
          case _ => lit(0L) // constant or all-null column carries no information
        }
      case _ => pmod(xxhash64(c), lit(top + 1))
    }
  }

  /** Morton interleave: bit i of column j lands at position i*nCols + j. */
  private def interleave(codes: Seq[Column], bits: Int): Column = {
    val n = codes.length
    codes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j))
      }
    }
  }

  /** The z-value column for `zCols`, with normalization bounds taken from
    * one min/max aggregation over `df` (a metadata-cheap single job). */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int = DefaultBits): Column = {
    require(zCols.size >= 2, "z-ordering needs at least two columns " +
      "(for one column use a plain range-packed sort: Layout.compact(sortCol=...))")
    require(zCols.size * bits <= 62, s"${zCols.size} cols × $bits bits exceeds a long")
    import org.apache.spark.sql.types._
    val numeric = zCols.filter(c => df.schema(c).dataType.isInstanceOf[NumericType])
    val bounds: Map[String, (Option[Double], Option[Double])] =
      if (numeric.isEmpty) Map.empty
      else {
        val aggs = numeric.flatMap(c => Seq(
          min(col(c).cast("double")).as(s"_min_$c"),
          max(col(c).cast("double")).as(s"_max_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head()
        numeric.map { c =>
          c -> (Option(r.getAs[java.lang.Double](s"_min_$c")).map(_.doubleValue()),
            Option(r.getAs[java.lang.Double](s"_max_$c")).map(_.doubleValue()))
        }.toMap
      }
    val codes = zCols.map { c =>
      val (lo, hi) = bounds.getOrElse(c, (None, None))
      code(col(c), df.schema(c).dataType, lo, hi, bits)
    }
    interleave(codes, bits)
  }

  /** Repartition+sort `df` along the Morton curve into `nFiles` outputs —
    * feed the result to any writer ([[Layout.writeVersioned]],
    * [[Formats.write]]); each output file then covers a small hyper-cube
    * of the zCols space and its footer min/max stats skip for every one
    * of them. */
  def pack(df: DataFrame, zCols: Seq[String], nFiles: Int,
      bits: Int = DefaultBits): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val z = zValue(df, zCols, bits)
    df.withColumn("_zorder", z)
      .repartitionByRange(nFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
  }
}
