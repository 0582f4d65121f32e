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
  * Mechanism, built from each filesystem's atomic primitives:
  *
  *  - ACQUIRE claims the lease path with the scheme's kernel/namenode-
  *    atomic create-if-absent (NIO createFile = open(O_CREAT|O_EXCL)
  *    locally; temp write + rename-if-absent on HDFS-like stores) and
  *    writes the holder token into it. A claim that fails after
  *    creating deletes its own partial file, so a token-less lease can
  *    never wedge the lake.
  *  - BREAK (lease older than `ttlMs` — a crashed writer) retires the
  *    stale file through a TOMBSTONE whose name is keyed on the stale
  *    content's hash, using an operation that FAILS if the tombstone
  *    already exists (hard-link creation locally, rename on HDFS —
  *    POSIX rename overwrites, so rename alone would not arbitrate).
  *    Exactly one racing breaker of a given stale generation can
  *    succeed, and a slow breaker that observed the OLD generation can
  *    never retire a successor's fresh lease — its tombstone name
  *    already exists. Tombstones are tiny one-per-break-event files;
  *    acquire sweeps those older than a day.
  *  - A HEARTBEAT daemon re-touches the lease mtime at ttl/4 while
  *    `withLease` runs (verifying the token first), so a LIVE writer
  *    running longer than the TTL is never mistaken for a crashed one.
  *  - RELEASE deletes only while the file carries our token, re-read
  *    immediately before the delete. A stall longer than the TTL
  *    between that read and the delete could still remove a
  *    successor's lease — the one window a rename-based filesystem
  *    protocol cannot close without compare-and-swap; the heartbeat
  *    makes it require a whole-TTL stall of an otherwise-live process.
  */
object WriterLease {

  /** Default staleness bound before a lease may be broken: 30 min.
    * The heartbeat keeps a live holder fresh, so this only has to
    * out-wait crash cleanup, not the longest legitimate run. */
  val DefaultTtlMs: Long = 30L * 60L * 1000L

  final case class Lease private[WriterLease] (base: String, token: String)

  private def leasePath(base: String) = new Path(s"$base/_graft_writer_lease")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Atomic claim: local scheme uses NIO createFile — open(O_CREAT|
    * O_EXCL), the one KERNEL-atomic create-if-absent POSIX offers (a
    * no-replace Files.move is emulated with an exists() pre-check and
    * races; Hadoop LocalFileSystem.create(overwrite=false) likewise).
    * The token lands in a second write; if that write fails we created
    * the file, so we can safely delete our own partial claim — a
    * token-less lease can only exist for the instant between the two
    * calls (readable as empty: release won't match it, a breaker sees
    * a fresh mtime and holds off). HDFS-like stores claim via temp
    * write + rename, which their namenode arbitrates atomically. */
  private def tryCreate(fs: FileSystem, p: Path, token: String): Boolean =
    if (fs.getUri.getScheme == "file") {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      val claimed =
        try {
          Option(local.getParent).foreach(java.nio.file.Files.createDirectories(_))
          java.nio.file.Files.createFile(local)
          true
        } catch { case _: java.io.IOException => false }
      claimed && {
        try { java.nio.file.Files.write(local, token.getBytes("UTF-8")); true }
        catch { case _: java.io.IOException =>
          try java.nio.file.Files.deleteIfExists(local)
          catch { case _: java.io.IOException => () }
          false
        }
      }
    } else {
      val tmp = new Path(p.toString + ".claim-" + token)
      try {
        val out = fs.create(tmp, true)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        try fs.rename(tmp, p) catch { case _: java.io.IOException => false }
      } catch { case _: java.io.IOException => false }
      finally { try fs.delete(tmp, false) catch { case _: java.io.IOException => () } }
    }

  private def holderOf(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  private def tombName(p: Path, staleBody: String): Path = {
    val h = java.security.MessageDigest.getInstance("SHA-256")
      .digest(staleBody.getBytes("UTF-8")).take(8)
      .map(b => f"$b%02x").mkString
    new Path(p.toString + ".tomb-" + h)
  }

  private def sweepOldTombstones(fs: FileSystem, p: Path): Unit =
    try {
      val dir = p.getParent
      val cutoff = System.currentTimeMillis() - 24L * 3600 * 1000
      fs.listStatus(dir).foreach { st =>
        if (st.getPath.getName.startsWith(p.getName + ".tomb-") &&
            st.getModificationTime < cutoff)
          fs.delete(st.getPath, false)
      }
    } catch { case _: java.io.IOException => () }

  /** Acquire the lake's writer lease or throw. Breaks a lease whose
    * file is older than `ttlMs` (a crashed writer — a live one is kept
    * fresh by the heartbeat); racing breakers are arbitrated by the
    * content-keyed tombstone rename. */
  def acquire(spark: SparkSession, base: String,
      ttlMs: Long = DefaultTtlMs): Lease = {
    val p = leasePath(base)
    val fs = fsOf(spark, p)
    val token = java.util.UUID.randomUUID().toString
    def held(): Nothing = throw new IllegalStateException(
      s"another writer holds the lease at $p — the lake is single-writer; " +
        "wait for the other curate-apply to finish (a crashed writer's " +
        s"lease breaks after ${ttlMs / 1000} s)")
    sweepOldTombstones(fs, p)
    if (tryCreate(fs, p, token)) return Lease(base, token)
    // Read the holder body BEFORE the staleness stat: the tombstone must
    // be keyed on content observed while the lease was stale. The old
    // order (stat, then read) raced a faster breaker B — B retires the
    // stale lease and installs its fresh one between our two steps, we
    // read B's NEW token as the "stale body", our tombstone name doesn't
    // exist yet, and we'd retire B's live lease. Body-first closes it:
    // if a successor replaced the file between our read and our stat,
    // the stat sees the successor's FRESH mtime and we bail to held().
    val staleBody = holderOf(fs, p).getOrElse("")
    val stale =
      try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > ttlMs
      catch { case _: java.io.IOException => true } // vanished: retry create
    if (!stale) held()
    // content-keyed tombstone break: one winner per stale generation,
    // and a successor's FRESH lease can never be retired by a slow
    // breaker of the old generation (its tombstone already exists, and
    // the retire op fails on an existing tombstone)
    val tomb = tombName(p, staleBody)
    if (fs.getUri.getScheme == "file") {
      // hard-link creation is atomic and FAILS if the link name exists
      // (POSIX rename would silently overwrite the tombstone and let a
      // second breaker retire the successor's fresh lease); only the
      // breaker whose link succeeded may delete the lease path
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(tomb.toUri.getPath),
          java.nio.file.Paths.get(p.toUri.getPath))
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(p.toUri.getPath))
      } catch { case _: java.io.IOException => () }
    } else
      // HDFS-like rename fails at the namenode if the destination exists
      try fs.rename(p, tomb)
      catch { case _: java.io.IOException => () }
    if (tryCreate(fs, p, token)) Lease(base, token) else held()
  }

  /** Release: delete only while the file still carries OUR token,
    * re-read immediately before the delete. */
  def release(spark: SparkSession, lease: Lease): Unit = {
    val p = leasePath(lease.base)
    val fs = fsOf(spark, p)
    if (holderOf(fs, p).contains(lease.token)) fs.delete(p, false)
  }

  /** Touch the lease mtime if we still hold it (heartbeat body).
    * Catches NonFatal, not just IOException: a RuntimeException from
    * fs.setTimes (e.g. UnsupportedOperationException on an object-store
    * FileSystem) would otherwise kill the daemon heartbeat thread and
    * silently make a live long-running writer breakable after the TTL. */
  private def refresh(fs: FileSystem, p: Path, token: String): Unit =
    try {
      if (holderOf(fs, p).contains(token))
        fs.setTimes(p, System.currentTimeMillis(), -1)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[writer-lease] heartbeat refresh failed " +
        s"(${e.getClass.getSimpleName}: ${e.getMessage}) — will retry " +
        "next interval")
    }

  def withLease[T](spark: SparkSession, base: String,
      ttlMs: Long = DefaultTtlMs)(body: => T): T = {
    val lease = acquire(spark, base, ttlMs)
    val p = leasePath(base)
    val fs = fsOf(spark, p)
    val stop = new java.util.concurrent.CountDownLatch(1)
    val beat = new Thread(() => {
      // ttl/4, floored at 1 s (don't spin on micro-TTLs) and capped at
      // ttl/2 (at least one refresh must land before staleness)
      val interval = math.min(math.max(ttlMs / 4, 1000L), math.max(ttlMs / 2, 1L))
      while (!stop.await(interval, java.util.concurrent.TimeUnit.MILLISECONDS))
        refresh(fs, p, lease.token)
    }, s"graft-writer-lease-heartbeat")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      stop.countDown()
      release(spark, lease)
    }
  }
}
