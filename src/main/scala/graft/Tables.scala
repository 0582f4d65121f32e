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

  /** `ts` is surfaced as LongType microseconds since epoch, whatever the
    * file encodes — generations of the synthetic corpus have shipped both
    * ns-precision INT64 (Spark 4 reads it as long ns under `nanosAsLong`;
    * `DIV 1000` truncates to µs) and plain µs TIMESTAMP/TIMESTAMP_NTZ
    * (`unix_micros` under the UTC session). Both land on the value DuckDB's
    * `epoch_us(ts)` — the correctness oracle — computes for the same file,
    * so all event-time arithmetic stays in exact integer µs either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // GraftSession sets this at build time; only touch session state for
    // foreign sessions that would otherwise fail an ns-file read (a
    // repeated conf.set would surprise concurrent users of a session)
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val tsMicros = df.schema("ts").dataType match {
      case LongType => expr("ts DIV 1000")
      case TimestampType | TimestampNTZType =>
        // NTZ→TZ cast reads the naive value in the session zone (UTC —
        // GraftSession pins it), which is exactly epoch_us's convention
        unix_micros(col("ts").cast("timestamp"))
      case other =>
        throw new IllegalArgumentException(s"events.ts: unsupported type $other")
    }
    df.withColumn("ts", tsMicros)
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
