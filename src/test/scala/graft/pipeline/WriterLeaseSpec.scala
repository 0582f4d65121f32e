package graft.pipeline

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ingest.{Layout, WriterLease}

/** The single-writer assumption made explicit (r13 verdict #6): two
  * concurrent curate-apply runs against one lake must produce ONE
  * winner and one clean refusal — never an interleaved version chain. */
class WriterLeaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"), col("source"))

  test("two concurrent incremental runs: one winner, one clean refusal, chain intact") {
    val base = Files.createTempDirectory("graft_lease_race").toString
    CuratePipeline.run(spark, docs.filter(pmod(col("doc_id"), lit(10)) < 8), base)
    val vBefore = Layout.committedVersions(spark, base, "curated/shards")
    val deltaA = docs.filter(pmod(col("doc_id"), lit(10)) === 8).localCheckpoint(true)
    val deltaB = docs.filter(pmod(col("doc_id"), lit(10)) === 9).localCheckpoint(true)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    def attempt(d: org.apache.spark.sql.DataFrame) =
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, Long]] {
        def call(): Either[Throwable, Long] = {
          start.await(10, TimeUnit.SECONDS)
          try Right(CuratePipeline.runIncremental(spark, d, base).count())
          catch { case t: Throwable => Left(t) }
        }
      })
    val fa = attempt(deltaA)
    val fb = attempt(deltaB)
    start.countDown()
    val results = Seq(fa.get(), fb.get())
    pool.shutdown()
    val winners = results.collect { case Right(n) => n }
    val refusals = results.collect { case Left(t) => t }
    // both may win only if they never overlapped (one finished before
    // the other acquired); what must NEVER happen is a failure that is
    // not the lease refusal, or a torn chain below
    assert(winners.nonEmpty, s"no winner: ${refusals.map(_.getMessage)}")
    refusals.foreach { t =>
      assert(t.isInstanceOf[IllegalStateException] &&
        t.getMessage.contains("another writer holds the lease"),
        s"unexpected failure kind: $t")
    }
    // chain integrity: every committed shards version resolves, the head
    // read works, and no (doc_id, copy) key is duplicated
    val vAfter = Layout.committedVersions(spark, base, "curated/shards")
    assert(vAfter.startsWith(vBefore))
    val all = Layout.loadLatest(spark, base, "curated/shards")
    assert(all.groupBy("doc_id", "copy").count().filter(col("count") > 1).count() == 0)
    // the winner's lease was released: a fresh acquire succeeds
    WriterLease.release(spark, WriterLease.acquire(spark, base))
  }

  test("the heartbeat keeps a live long-running writer's lease unbreakable past the TTL") {
    val base = Files.createTempDirectory("graft_lease_beat").toString
    val t = new Thread(() => WriterLease.withLease(spark, base, ttlMs = 2000L) {
      Thread.sleep(6000) // run 3x the TTL; the ttl/4 heartbeat re-touches
    })
    t.start()
    try {
      Thread.sleep(3000) // well past the raw TTL
      // a second writer must STILL be refused: the heartbeat has kept
      // the lease fresh, so it is not breakable despite age > ttl
      val e = intercept[IllegalStateException](
        WriterLease.acquire(spark, base, ttlMs = 2000L))
      assert(e.getMessage.contains("another writer holds the lease"))
    } finally t.join()
    // after the body finishes the lease is released; acquire succeeds
    WriterLease.release(spark, WriterLease.acquire(spark, base))
  }

  test("a crashed writer's stale lease breaks after the TTL; a live one is honored") {
    val base = Files.createTempDirectory("graft_lease_ttl").toString
    val held = WriterLease.acquire(spark, base)
    // live lease: refused
    val e = intercept[IllegalStateException](WriterLease.acquire(spark, base))
    assert(e.getMessage.contains("another writer holds the lease"))
    // age the file past a short TTL: breakable, and the breaker owns it
    val f = new java.io.File(s"$base/_graft_writer_lease")
    assert(f.setLastModified(System.currentTimeMillis() - 60000))
    val broken = WriterLease.acquire(spark, base, ttlMs = 1000)
    // the original holder's release must NOT delete the successor's lease
    WriterLease.release(spark, held)
    assert(f.exists(), "stale holder's release deleted the successor's lease")
    WriterLease.release(spark, broken)
    assert(!f.exists())
  }
}
