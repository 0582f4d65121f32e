package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.functions.{TextFunctions => TF}
import graft.ingest.Layout
import graft.pipeline.CuratePipeline

/** Measures the norm bank's probe-read fraction and bytes-per-bucket as
  * a function of `normBankBuckets` (r12 verdict #7): the delta probe
  * reads |touched buckets| / buckets of the bank, so the bucket count
  * is the knob that turns trickle-delta reads from "the whole bank"
  * into a few hundred MB at 100 TB. The bank here is the corpus's
  * distinct normFp set — byte-identical in shape to what
  * [[CuratePipeline.run]] persists. Usage:
  *   runMain graft.tools.NormBankProbe <sfDir>
  */
object NormBankProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf4")
    val spark = GraftSession.create()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fps = docs
      .select(CuratePipeline.normFp(TF.normalizeWs(col("text"))).as("norm_fp"))
      .distinct().localCheckpoint(true)
    val nFps = fps.count()

    def bytesUnder(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(bytesUnder).sum

    Seq(64, 256).foreach { b =>
      val base = java.nio.file.Files.createTempDirectory(s"graft_bankprobe_$b").toString
      Layout.writeVersioned(
        fps.withColumn("bucket", CuratePipeline.normBucket(0, b)),
        base, CuratePipeline.Frozen.NormBank, partitionCols = Seq("bucket"))
      val bankDir = new java.io.File(Layout.versionedDir(
        base, CuratePipeline.Frozen.NormBank, 1))
      val dirBytes = bankDir.listFiles().filter(_.isDirectory)
        .map(d => d.getName -> bytesUnder(d)).toMap
      val totalBytes = dirBytes.values.sum
      println(f"PROBE buckets=$b%-3d bank_fps=$nFps bank_bytes=$totalBytes " +
        f"bytes_per_bucket=${totalBytes / b}")

      Seq(1, 10, 100, 1000, 10000).foreach { n =>
        val delta = docs.filter(col("doc_id") < n)
        val hit = delta.select(pmod(
            CuratePipeline.normFp(TF.normalizeWs(col("text"))), lit(b.toLong)).as("_b"))
          .distinct().collect().map(r => f"f${r.getLong(0)}%03d").toSet
        val touchedBytes = dirBytes.collect {
          case (name, sz) if hit.exists(h => name.endsWith(s"-$h")) => sz
        }.sum
        val t0 = System.nanoTime()
        val readRows = CuratePipeline.prunedNormBank(spark, base, delta, b).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROBE buckets=$b%-3d delta=$n%-5d touched=${hit.size}%3d/$b " +
          f"bytes_frac=${touchedBytes.toDouble / totalBytes}%.3f " +
          f"rows_read=$readRows read_s=$sec%.2f")
      }
    }
    spark.stop()
  }
}
