package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tables.readRange must shrink the FILE list (not just row groups) for
  * a selective range predicate on a multi-file table, and stay exactly
  * equivalent to the plain filtered read.
  */
class TablesReadRangeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("range read on a multi-file table opens fewer files, same rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tbl_range").toString
    spark.range(0, 400)
      .select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(s"$dir/tbl.parquet")
    val total = spark.read.parquet(s"$dir/tbl.parquet").inputFiles.length
    assert(total == 4, s"expected a 4-file layout, got $total")

    val pruned = Tables.readRange(spark, dir, "tbl", "k", 0L, 50L)
    assert(pruned.inputFiles.length < total,
      s"footer stats must skip files outside [0,50]: opened ${pruned.inputFiles.length} of $total")
    val expect = spark.read.parquet(s"$dir/tbl.parquet")
      .filter(col("k") >= 0 && col("k") <= 50)
      .collect().map(_.getLong(0)).sorted.toSeq
    val got = pruned.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expect, "file pruning changed the result set")
  }

  test("single-file tables degrade to the plain scan (driver testdata shape)") {
    val df = Tables.readRange(spark, "/root/testdata/sf0.001", "embeddings",
      "vec_id", Long.MinValue, 9L)
    assert(df.count() == 10)
  }
}
