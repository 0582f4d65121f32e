package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, "alpha", 1.5, Timestamp.valueOf("2026-01-01 10:00:00"), Some("x")),
    (2L, "beta,with,commas", -2.25, Timestamp.valueOf("2026-01-02 11:30:00"), None),
    (3L, "", 0.0, Timestamp.valueOf("2026-01-03 12:45:00"), Some("z")))

  private def frame() =
    rows.toDF("id", "name", "score", "ts", "opt")

  for (fmt <- Seq("parquet", "orc", "json", "csv")) {
    test(s"$fmt round-trips rows and schema under enforcement") {
      val dir = Files.createTempDirectory(s"graft_fmt_$fmt").toString
      val df = frame()
      Formats.write(df, dir, fmt)
      val back = Formats.read(spark, dir, fmt, df.schema)
      // file sources force nullable=true; names and types must round-trip
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        df.schema.map(f => (f.name, f.dataType)))
      val a = df.orderBy("id").collect().toSeq
      val b = back.orderBy("id").collect().toSeq
      // CSV cannot distinguish empty string from null — both read back null
      if (fmt == "csv") {
        assert(b.map(_.getLong(0)) == a.map(_.getLong(0)))
        assert(b.map(_.getDouble(2)) == a.map(_.getDouble(2)))
        assert(b.map(_.getTimestamp(3)) == a.map(_.getTimestamp(3)))
        assert(b.map(r => Option(r.getString(1)).getOrElse("")) == a.map(_.getString(1)))
      } else {
        assert(b == a)
      }
    }
  }

  test("csv write refuses nested columns by name") {
    val df = frame().withColumn("arr",
      org.apache.spark.sql.functions.array($"id"))
    val dir = Files.createTempDirectory("graft_fmt_bad").toString
    val e = intercept[IllegalArgumentException] {
      Formats.write(df, dir, "csv")
    }
    assert(e.getMessage.contains("arr"))
  }

  test("unknown format is rejected") {
    intercept[IllegalArgumentException] {
      Formats.write(frame(), "/tmp/never", "xml")
    }
  }

  test("partitioned orc write prunes and reads back full rows") {
    val dir = Files.createTempDirectory("graft_fmt_part").toString
    val df = frame().withColumn("part",
      org.apache.spark.sql.functions.pmod($"id", org.apache.spark.sql.functions.lit(2)))
    Formats.write(df, dir, "orc", partitionBy = Seq("part"))
    val back = Formats.read(spark, dir, "orc",
      StructType(df.schema.filterNot(_.name == "part")).add("part", LongType))
    assert(back.count() == 3)
    // partition pruning: only one directory's files are read
    val pruned = back.filter($"part" === 0L)
    assert(pruned.inputFiles.forall(_.contains("part=0")) || pruned.count() == 1)
  }
}
