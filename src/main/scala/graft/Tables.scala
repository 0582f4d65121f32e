package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (see TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file source. The `events` table is written
  * with nanosecond-precision timestamps, which Spark 4 refuses to read as
  * TIMESTAMP; we read them as `long` nanoseconds-since-epoch
  * (`spark.sql.legacy.parquet.nanosAsLong`) and keep all event-time
  * arithmetic in integer nanoseconds — exact, overflow-safe until 2262,
  * and immune to float drift in cross-engine comparisons.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Selective numeric-range read with FILE-level skipping: parquet
    * footer min/max stats shrink the file list before the scan starts
    * ([[graft.ingest.FileStats.prunedRead]]), then the row-level range
    * filter is applied on top (file pruning is a superset guarantee).
    * On the driver's single-file tables this degrades to the plain
    * pushed-filter scan at the cost of one footer read; on a versioned
    * multi-file layout (the 100 TB shape — thousands of files, ranges
    * narrowed by Z-ordering) the planner never even lists the skipped
    * files. Bounds are Longs so the row filter stays uncast and keeps
    * reaching the parquet reader as a pushed filter. */
  def readRange(spark: SparkSession, dir: String, name: String,
      column: String, lo: Long, hi: Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (pruned, _, _) = graft.ingest.FileStats.prunedRead(
      spark, path(dir, name), column, lo.toDouble, hi.toDouble)
    pruned.filter(col(column) >= lo && col(column) <= hi)
  }

  /** [[documents]] through [[graft.core.Par.spread]] — for stage-1-heavy
    * text kernels (language ID, shingling, explode-based token counting,
    * collocations) that would otherwise run their whole first stage on
    * the scan's partition count (1 on single-row-group files). */
  def documentsSpread(spark: SparkSession, dir: String): DataFrame =
    graft.core.Par.spread(documents(spark, dir))

  /** `ts` is surfaced as LongType microseconds since epoch.
    *
    * The file stores nanosecond precision; Spark 4 reads it as long ns
    * (`nanosAsLong`), but DuckDB's parquet reader — the correctness
    * oracle — truncates ns to µs on read, so sub-µs digits can never be
    * compared. We standardize on truncated µs (`DIV 1000`) everywhere. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // GraftSession sets this at build time; only touch session state for
    // foreign sessions that would otherwise fail the read (a repeated
    // conf.set would surprise concurrent users of a shared session)
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events").withColumn("ts", org.apache.spark.sql.functions.expr("ts DIV 1000"))
  }

  /** Register every table as a temp view so `spark.sql("SELECT …")` works
    * directly against the corpus — the SQL front door. Views are lazy
    * plans over the parquet scans (same pruning/pushdown as the typed
    * accessors); `events` keeps its µs-long `ts` semantics. */
  def createViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")
      .foreach(n => read(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
  }
}
