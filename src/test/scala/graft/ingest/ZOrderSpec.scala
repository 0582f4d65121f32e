package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Mean per-file value range of `c`, as a fraction of the global range:
    * ~1.0 means footer stats never skip, small means they skip hard. */
  private def meanRangeFraction(dir: String, c: String, global: Double): Double = {
    val files = spark.read.parquet(dir).inputFiles
    val fracs = files.map { f =>
      val r = spark.read.parquet(f).agg(
        min(col(c).cast("double")), max(col(c).cast("double"))).head()
      (r.getDouble(1) - r.getDouble(0)) / global
    }
    fracs.sum / fracs.length
  }

  test("z-order makes BOTH columns skippable; single-column sort only one") {
    // 64×64 grid, x and y independent
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).as("y"))

    val zDir = Files.createTempDirectory("graft_z").toString
    ZOrder.pack(df, Seq("x", "y"), nFiles = 16).write.mode("overwrite").parquet(zDir)

    val sDir = Files.createTempDirectory("graft_s").toString
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sDir)

    val zx = meanRangeFraction(zDir, "x", 63.0)
    val zy = meanRangeFraction(zDir, "y", 63.0)
    val sy = meanRangeFraction(sDir, "y", 63.0)

    // 16 files ≈ a 4×4 Morton grid: each file covers ~1/4 of each axis
    assert(zx <= 0.5, s"z-order x range fraction $zx")
    assert(zy <= 0.5, s"z-order y range fraction $zy")
    // the x-sorted layout leaves y unskippable
    assert(sy >= 0.9, s"x-sorted layout should not cluster y (got $sy)")
  }

  test("file-stats index skips most z-ordered files for a selective range") {
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).as("y"))
    val dir = Files.createTempDirectory("graft_zskip").toString
    ZOrder.pack(df, Seq("x", "y"), nFiles = 16).write.mode("overwrite").parquet(dir)

    // selective on x: a 4×4 Morton grid keeps x∈[0,7] inside ~1/4 of files
    val (pruned, read, total) = FileStats.prunedRead(spark, dir, "x", 0, 7)
    assert(total == 16)
    assert(read <= total / 2, s"expected file skipping, read $read/$total")
    // superset guarantee: pruned + row filter == full + row filter
    val want = df.filter(col("x").between(0, 7)).count()
    assert(pruned.filter(col("x").between(0, 7)).count() == want)

    // and the same works on y — the second z-order column
    val (prunedY, readY, _) = FileStats.prunedRead(spark, dir, "y", 0, 15)
    assert(readY <= total / 2, s"y pruning read $readY/$total")
    assert(prunedY.filter(col("y").between(0, 15)).count() ==
      df.filter(col("y").between(0, 15)).count())

    // out-of-range predicate reads nothing but keeps the schema
    val (none, readNone, _) = FileStats.prunedRead(spark, dir, "x", 1000, 2000)
    assert(readNone == 0 && none.count() == 0 && none.columns.contains("x"))
  }

  test("compact with zOrderCols publishes a z-clustered version") {
    val base = Files.createTempDirectory("graft_zc").toString
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).as("y"))
    // v1: deliberately scattered layout
    Layout.writeVersioned(df.repartition(16), base, "normalized")
    val dir = Layout.compact(spark, base, "normalized",
      targetBytes = 4L * 1024, zOrderCols = Seq("x", "y"))
    assert(Layout.committedVersions(spark, base, "normalized") == Seq(1, 2))
    val files = spark.read.parquet(dir).inputFiles
    assert(files.length > 3, s"need several files to show clustering: ${files.length}")
    val zx = meanRangeFraction(dir, "x", 63.0)
    val zy = meanRangeFraction(dir, "y", 63.0)
    assert(zx <= 0.6 && zy <= 0.6, s"z-compacted ranges x=$zx y=$zy")
    assert(Layout.loadLatest(spark, base, "normalized").count() == 4096)
  }

  test("row set is preserved and string columns are accepted") {
    val df = spark.range(500).select(
      col("id").as("n"),
      concat(lit("k"), (col("id") % 7)).as("s"))
    val packed = ZOrder.pack(df, Seq("n", "s"), nFiles = 4)
    assert(packed.columns.toSeq == Seq("n", "s"))
    assert(packed.as[(Long, String)].collect().toSet ==
      df.as[(Long, String)].collect().toSet)
  }

  test("z-value is injective over a full integer grid (no interleave collisions)") {
    val df = spark.range(4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).as("y"))
    val n = df.select(ZOrder.zValue(df, Seq("x", "y")).as("z"))
      .distinct().count()
    assert(n == 4096, s"expected 4096 distinct z-values, got $n")
  }

  test("degenerate inputs: constant column and fewer than two cols") {
    val df = spark.range(100).select(col("id").as("a"), lit(5L).as("b"))
    // constant column contributes nothing but must not break
    assert(ZOrder.pack(df, Seq("a", "b"), 2).count() == 100)
    intercept[IllegalArgumentException] {
      ZOrder.zValue(df, Seq("a"))
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(df, Seq("a", "b"), bits = 40)
    }
  }
}
