package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layouts for co-located joins.
  *
  * Two tables bucketed by the same key into the same bucket count join
  * WITHOUT a shuffle: each task reads matching bucket files from both
  * sides. This is the 100 TB answer to the fact-to-fact joins in this
  * engine (spans ⨝ embeddings on span_id, lineitem ⨝ orders on orderkey):
  * pay the partitioning once at write time, reuse it across every
  * downstream join and aggregation on that key. With `sortCols` the
  * sort-merge join's per-task sort disappears too.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally sorted) managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
