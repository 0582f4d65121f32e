package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned `{layer}/{vN}` lakehouse layout (S9) and raw-file archival
  * (S16). Reference: src/lakehouse/structure.py:20-40,
  * ingestion/writer.py:220-310, ingestion/pipeline.py:284-299.
  *
  * All paths go through the Hadoop FileSystem API, so the layout works
  * unchanged on local disk, HDFS, or an object store — version discovery
  * is one directory listing of the layer, never a recursive walk.
  */
object Layout {

  /** Standard layer directories (structure.py:20-30). */
  val Layers: Seq[String] = Seq(
    "raw", "normalized", "spans", "beats", "sections",
    "embeddings", "ann_index", "catalogs")

  def versionedDir(base: String, layer: String, version: Int): String =
    s"$base/$layer/v$version"

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Existing version numbers of a layer, ascending (empty if none). */
  def versions(spark: SparkSession, base: String, layer: String): Seq[Int] = {
    val dir = new Path(s"$base/$layer")
    val f = fs(spark, base)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      .sorted
  }

  def latestVersion(spark: SparkSession, base: String, layer: String): Option[Int] =
    versions(spark, base, layer).lastOption

  /** Write a layer at an explicit version, or at latest+1 when `version`
    * is None (the writer.py `create_versioned_directory` + write flow;
    * new versions never clobber old ones — that's the point of vN). */
  def writeVersioned(df: DataFrame, base: String, layer: String,
      version: Option[Int] = None, partitionCols: Seq[String] = Nil): String = {
    val v = version.getOrElse(latestVersion(df.sparkSession, base, layer).getOrElse(0) + 1)
    val dir = versionedDir(base, layer, v)
    val w = df.write.mode(if (version.isDefined) "overwrite" else "errorifexists")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(dir)
    dir
  }

  /** Read the newest version of a layer (S14-style load-latest). */
  def loadLatest(spark: SparkSession, base: String, layer: String): DataFrame = {
    val v = latestVersion(spark, base, layer).getOrElse(
      throw new IllegalArgumentException(s"no versions of $layer under $base"))
    spark.read.parquet(versionedDir(base, layer, v))
  }

  /** S16 raw archival: copy source transcript files into `{base}/raw/`,
    * renamed to `{episodeId}{ext}` (pipeline.py:284-299). Driver-side file
    * copy — raw inputs are per-episode files, not a distributed dataset. */
  def archiveRaw(spark: SparkSession, files: Seq[(String, String)], base: String): Seq[String] = {
    val rawDir = new Path(s"$base/raw")
    val f = fs(spark, base)
    f.mkdirs(rawDir)
    files.map { case (src, episodeId) =>
      val srcPath = new Path(src)
      val name = srcPath.getName
      val ext = name.lastIndexOf('.') match {
        case -1 => ""
        case i  => name.substring(i)
      }
      val dest = new Path(rawDir, s"$episodeId$ext")
      org.apache.hadoop.fs.FileUtil.copy(
        srcPath.getFileSystem(spark.sparkContext.hadoopConfiguration), srcPath,
        f, dest, false, true, spark.sparkContext.hadoopConfiguration)
      dest.toString
    }
  }
}
