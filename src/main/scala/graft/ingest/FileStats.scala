package graft.ingest

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File-level min/max data skipping from parquet footers — the
  * Delta/Iceberg stats-index idea. Spark's native parquet reader prunes
  * ROW GROUPS from footer stats, but it still has to list, open, and
  * read the footer of every file in the scan; with a stats index the
  * planner-side file LIST shrinks before the scan starts. Combined with
  * [[ZOrder]] (which is what makes per-file ranges narrow on several
  * columns at once), a selective predicate reads a handful of files out
  * of tens of thousands.
  *
  * Stats collection is footer-only metadata IO, done once per layout
  * write and reusable across queries (persist the returned frame next to
  * the data, the way [[Layout.commit]] persists row counts). Collection
  * iterates files on the driver — at very large file counts, parallelize
  * the listing and feed paths through `spark.read.parquet(paths: _*)`
  * exactly as done here.
  */
object FileStats {

  final case class ColRange(column: String, min: Double, max: Double)
  final case class FileStat(path: String, rows: Long, ranges: Seq[ColRange])

  private def toDouble(v: Any): Option[Double] = v match {
    case l: java.lang.Long    => Some(l.toDouble)
    case i: java.lang.Integer => Some(i.toDouble)
    case d: java.lang.Double  => Some(d.doubleValue())
    case f: java.lang.Float   => Some(f.toDouble)
    case _                    => None // binary/string stats not indexed here
  }

  /** Footer min/max of `cols` for every parquet file under `dir`. */
  def collect(spark: SparkSession, dir: String, cols: Seq[String]): Seq[FileStat] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = Seq.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) buf += st.getPath.toString
      }
      buf.result()
    }
    files.flatMap { f =>
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks.asScala.toSeq
          val ranges = cols.flatMap { c =>
            val stats = blocks.flatMap(_.getColumns.asScala
              .find(_.getPath.toDotString == c).map(_.getStatistics))
              .filter(s => s != null && s.hasNonNullValue)
            val mins: Seq[Double] = stats.flatMap(s => toDouble(s.genericGetMin))
            val maxs: Seq[Double] = stats.flatMap(s => toDouble(s.genericGetMax))
            if (mins.isEmpty || maxs.isEmpty) None
            else Some(ColRange(c, mins.min, maxs.max))
          }
          Some(FileStat(f, reader.getRecordCount, ranges))
        } finally reader.close()
      } catch { case _: Exception => None }
    }
  }

  /** The stats index is collected once per layout write and reusable
    * across queries (its whole point) — cache it per (dir, column) keyed
    * by the directory's latest file mtime, so a query that builds its
    * plan through [[prunedRead]] doesn't re-open every footer on every
    * build. An overwrite/append bumps some file's mtime and naturally
    * invalidates the key. */
  private val statsCache =
    new scala.collection.concurrent.TrieMap[(String, String, Long), Seq[FileStat]]

  private def latestMtime(spark: SparkSession, dir: String): Long =
    try {
      val p = new Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var m = fs.getFileStatus(p).getModificationTime
      while (it.hasNext) {
        val st = it.next()
        if (st.getModificationTime > m) m = st.getModificationTime
      }
      m
    } catch { case _: Exception => -1L }

  /** Read only the files whose `[min, max]` range for `column` intersects
    * `[lo, hi]` (files without stats for the column are conservatively
    * included). Returns the pruned frame plus (filesRead, filesTotal) so
    * callers can see the skipping actually happen. The caller still
    * applies the row-level filter — file pruning is a superset guarantee,
    * not a filter. */
  def prunedRead(spark: SparkSession, dir: String, column: String,
      lo: Double, hi: Double): (DataFrame, Int, Int) = {
    val mtime = latestMtime(spark, dir)
    val stats =
      if (mtime < 0) collect(spark, dir, Seq(column))
      else statsCache.getOrElseUpdate((dir, column, mtime),
        collect(spark, dir, Seq(column)))
    val keep = stats.filter { fsEntry =>
      fsEntry.ranges.find(_.column == column) match {
        case Some(r) => r.max >= lo && r.min <= hi
        case None    => true
      }
    }.map(_.path)
    require(stats.nonEmpty, s"no parquet files under $dir")
    // basePath keeps hive partition columns intact when the kept files
    // live under key=value subdirectories of `dir` — only legal (and
    // only meaningful) when `dir` is a directory, not a bare file
    val p2 = new Path(dir)
    val reader =
      if (p2.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .getFileStatus(p2).isDirectory)
        spark.read.option("basePath", dir)
      else spark.read
    val df =
      if (keep.isEmpty) reader.parquet(stats.head.path).limit(0)
      else reader.parquet(keep: _*)
    (df, keep.length, stats.length)
  }
}
