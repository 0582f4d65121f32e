package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SchemaReportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("the current driver testdata is schema-clean") {
    val deltas = SchemaReport.diff(spark, "/root/testdata/sf0.001")
    assert(deltas.isEmpty, s"unexpected deltas:\n${deltas.mkString("\n")}")
  }

  test("a retyped column and a new column are both flagged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_schema").toString
    // documents with doc_id retyped to string and an extra column
    Seq(("1", "hello", "en", "s0", 5L, 1.0))
      .toDF("doc_id", "text", "lang", "source", "n_chars", "quality")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val deltas = SchemaReport.diff(spark, dir)
    assert(deltas.exists(d => d.startsWith("documents.doc_id: TYPE string")), deltas.mkString("\n"))
    assert(deltas.exists(_.startsWith("documents.quality: NEW COLUMN")), deltas.mkString("\n"))
    // the other tables are absent from the temp dir → unreadable lines
    assert(deltas.exists(_.startsWith("events: UNREADABLE")))
  }
}
