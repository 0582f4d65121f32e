package graft.snapshot

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Versioned, checksummed snapshots (reference:
  * src/lakehouse/snapshot/artifacts.py:231-452, config.py:148-303,
  * manifest.py).
  *
  * Checksumming runs as a Spark job over `binaryFile` — at 100 TB the
  * manifest hash pass is itself distributed; the reference hashes files
  * one by one on the driver.
  */
object Snapshot {

  final case class FileEntry(path: String, bytes: Long, sha256: String)
  final case class Manifest(version: String, createdUtc: String, files: Seq[FileEntry])

  /** sha256 + size for every file under a directory (distributed). */
  def checksumDirectory(spark: SparkSession, dir: String): Seq[FileEntry] =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("length"), sha2(col("content"), 256).as("sha256"))
      .collect()
      .map(r => FileEntry(r.getString(0), r.getLong(1), r.getString(2)))
      .sortBy(_.path).toSeq

  /** Semver parse / auto-increment (config.py:148-303). */
  def parseSemver(v: String): Option[(Int, Int, Int)] =
    "^v?(\\d+)\\.(\\d+)\\.(\\d+)$".r.findFirstMatchIn(v)
      .map(m => (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt))

  def bumpSemver(v: String, part: String = "patch"): String =
    parseSemver(v).map { case (ma, mi, pa) =>
      part match {
        case "major" => s"v${ma + 1}.0.0"
        case "minor" => s"v$ma.${mi + 1}.0"
        case _       => s"v$ma.$mi.${pa + 1}"
      }
    }.getOrElse("v0.1.0")

  def renderManifestJson(m: Manifest): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val files = m.files.map(f =>
      s"""{"path": "${esc(f.path)}", "bytes": ${f.bytes}, "sha256": "${f.sha256}"}""")
      .mkString("[", ", ", "]")
    s"""{"version": "${esc(m.version)}", "created_utc": "${esc(m.createdUtc)}", "files": $files}"""
  }

  /** Snapshot = copy artifacts dir + manifest with checksums + row counts.
    * Copies via Hadoop FS so it works on any supported filesystem. */
  def create(spark: SparkSession, artifactsDir: String, snapshotDir: String,
      version: String, nowUtc: String): Manifest = {
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(artifactsDir)
    val dst = new org.apache.hadoop.fs.Path(s"$snapshotDir/$version")
    val fs = src.getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, true, conf)
    val manifest = Manifest(version, nowUtc, checksumDirectory(spark, dst.toString))
    val out = fs.create(new org.apache.hadoop.fs.Path(dst, "manifest.json"), true)
    out.write(renderManifestJson(manifest).getBytes("UTF-8"))
    out.close()
    manifest
  }

  /** Validate a snapshot dir against its manifest (re-hash + compare).
    * Drops Spark's cached file listing first — in-place modifications
    * would otherwise be read with stale file sizes. */
  def validate(spark: SparkSession, snapshotVersionDir: String, m: Manifest): Seq[String] = {
    spark.catalog.refreshByPath(snapshotVersionDir)
    val current = checksumDirectory(spark, snapshotVersionDir)
      .filterNot(_.path.endsWith("manifest.json"))
      .map(f => f.path -> f.sha256).toMap
    m.files.flatMap { f =>
      current.get(f.path) match {
        case None => Some(s"missing: ${f.path}")
        case Some(h) if h != f.sha256 => Some(s"checksum mismatch: ${f.path}")
        case _ => None
      }
    }
  }
}
