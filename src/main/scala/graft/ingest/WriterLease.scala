package graft.ingest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Explicit single-writer arbitration for a Layout-managed lake.
  *
  * The Layout/Merge analog assumes ONE writer per lake (the deviation
  * SURVEY §1.4 documents vs a real transactional table format's
  * optimistic concurrency): two concurrent `curate-apply` runs could
  * interleave versioned commits and leave a merge chain whose links
  * reference versions the other writer superseded. This lease makes the
  * assumption enforced instead of implicit — a second writer FAILS FAST
  * with a clear diagnosis instead of corrupting the chain.
  *
  * Mechanism: one lease file under the lake base, created with
  * `FileSystem.create(path, overwrite = false)` — the atomic
  * create-if-absent every Hadoop filesystem provides (the same
  * arbitration primitive a real format's commit log uses for its
  * version files). The holder's token is written inside; release
  * deletes only if the token still matches, so a crashed writer's lease
  * broken by TTL is never deleted out from under its successor.
  *
  * Crash handling: a writer that dies without releasing leaves the
  * lease behind; a new writer may BREAK it once it is older than
  * `ttlMs` (delete + re-create, with the create arbitrating racing
  * breakers). The TTL is wall-clock staleness of the lease file — a
  * live long-running writer should be finished or visibly progressing
  * well inside it. */
object WriterLease {

  /** Default staleness bound before a lease may be broken: 30 min. */
  val DefaultTtlMs: Long = 30L * 60L * 1000L

  final case class Lease private[WriterLease] (base: String, token: String)

  private def leasePath(base: String) = new Path(s"$base/_graft_writer_lease")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tryCreate(fs: FileSystem, p: Path, token: String): Boolean =
    if (fs.getUri.getScheme == "file") {
      // the LOCAL filesystem's create(overwrite = false) is a
      // check-then-act (exists? then open) — two racing writers can
      // both "win". NIO CREATE_NEW is O_CREAT|O_EXCL: kernel-atomic.
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.write(local, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.io.IOException => false }
    } else
      try {
        // on HDFS-like stores create(overwrite = false) IS the atomic
        // namenode-arbitrated create-if-absent
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }

  private def holderOf(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Acquire the lake's writer lease or throw. Breaks a lease whose
    * file is older than `ttlMs` (a crashed writer); racing breakers are
    * arbitrated by the atomic re-create. */
  def acquire(spark: SparkSession, base: String,
      ttlMs: Long = DefaultTtlMs): Lease = {
    val p = leasePath(base)
    val fs = fsOf(spark, p)
    val token = java.util.UUID.randomUUID().toString
    def held(): Nothing = throw new IllegalStateException(
      s"another writer holds the lease at $p — the lake is single-writer; " +
        "wait for the other curate-apply to finish (a crashed writer's " +
        s"lease breaks after ${ttlMs / 1000} s)")
    if (tryCreate(fs, p, token)) return Lease(base, token)
    val stale =
      try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > ttlMs
      catch { case _: java.io.IOException => true } // vanished: retry create
    if (!stale) held()
    try fs.delete(p, false) catch { case _: java.io.IOException => () }
    if (tryCreate(fs, p, token)) Lease(base, token) else held()
  }

  /** Release: delete only while the file still carries OUR token — a
    * TTL-broken lease re-held by a successor is left alone. */
  def release(spark: SparkSession, lease: Lease): Unit = {
    val p = leasePath(lease.base)
    val fs = fsOf(spark, p)
    if (holderOf(fs, p).contains(lease.token)) fs.delete(p, false)
  }

  def withLease[T](spark: SparkSession, base: String,
      ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val lease = acquire(spark, base, ttlMs)
    try body finally release(spark, lease)
  }
}
