package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ingest.{Layout, Merge}
import graft.pipeline.CuratePipeline

/** Decomposes the PRODUCT delta-batch cost (`runIncremental` against a
  * persisted lake — the bench `curate_delta` phase) into its sections,
  * so the phase number on the official record is attributable:
  * frozen-layer loads, the incremental stage chain, each layer MERGE,
  * and the accounting. Usage:
  *   runMain graft.tools.CurateDeltaProbe <sfDir>
  */
object CurateDeltaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.create()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))

    // batch-size amortization ladder (r13 verdict #4): the bench's
    // 64 rows/s at a 500-doc microbatch is per-job fixed overhead, not
    // the path's rate — run sequential 500 / 5,000 / remainder batches
    // against ONE persisted lake and put the fixed-overhead knee on
    // record. Usage: runMain graft.tools.CurateDeltaProbe <sfDir> ladder
    if (args.lift(1).contains("ladder")) {
      val base = java.nio.file.Files.createTempDirectory("graft_probe_ladder").toString
      val t0 = System.nanoTime()
      CuratePipeline.run(spark, docs.filter(pmod(col("doc_id"), lit(5)) < 4), base)
      println(f"PROBE ladder full_run ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      val pool = docs.filter(pmod(col("doc_id"), lit(5)) === 4)
      val ids = pool.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
      var off = 0
      // each rung takes what the pool can still supply — a small sf
      // trims or drops rungs instead of indexing past the pool
      Seq(500, 5000, Int.MaxValue).foreach { want =>
        val n = math.min(want, ids.length - off)
        if (n > 0) {
          val batch = pool
            .filter(col("doc_id").between(ids(off), ids(off + n - 1)))
            .localCheckpoint(true)
          val tb = System.nanoTime()
          CuratePipeline.runIncremental(spark, batch, base)
          val sec = (System.nanoTime() - tb) / 1e9
          println(f"PROBE ladder batch=$n%6d sec=$sec%7.2f " +
            f"rows_per_s=${(n / sec).toLong}")
          off += n
        }
      }
      spark.stop()
      return
    }

    val base = java.nio.file.Files.createTempDirectory("graft_probe_lake").toString
    CuratePipeline.run(spark, docs.filter(pmod(col("doc_id"), lit(10)) < 8), base)
    CuratePipeline.runIncremental(spark, docs.filter(pmod(col("doc_id"), lit(10)) === 8), base)

    // measured batch, decomposed (mirrors runIncremental's section order)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val delta = docs.filter(pmod(col("doc_id"), lit(10)) === 9).localCheckpoint(true)
    val total0 = System.nanoTime()
    val cfg = graft.pipeline.CurateConfig()
    val frozen = timed("frozen_loads") {
      val f = CuratePipeline.FrozenParams(
        bankedNorms = CuratePipeline.prunedNormBank(spark, base, delta),
        index = Layout.loadLatest(spark, base, CuratePipeline.Frozen.NearDupIndex).drop("batch"),
        benchGrams = Layout.loadLatest(spark, base, CuratePipeline.Frozen.BenchGrams).drop("batch"),
        bounds = Layout.loadLatest(spark, base, CuratePipeline.Frozen.CurriculumBounds),
        alloc = Layout.loadLatest(spark, base, CuratePipeline.Frozen.UnimaxAlloc))
      f.bankedNorms.count() // materialize the pruned bank read
      f
    }
    val st = timed("incremental_stages") {
      val s = CuratePipeline.incrementalStages(delta, frozen, cfg)
      s.foreach(_._2.count()) // stages are eager checkpoints; count is cheap
      s
    }
    val frames = st.toMap
    val shardDelta = frames("shards").localCheckpoint(false)
    timed("merge_shards") {
      if (!shardDelta.isEmpty)
        Merge.merge(spark, base, "curated/shards", shardDelta,
          Seq("doc_id", "copy"), "shard_key")
    }
    timed("merge_neardup_index") {
      val batchNo = Layout.committedVersions(spark, base, CuratePipeline.Frozen.NearDupIndex).last + 1
      val newIdx = graft.operators.Dedup.nearDupIndex(frames("neardup"), "doc_id",
        col("text"), cfg.shingleWords, cfg.minhashK)
        .withColumn("batch", format_string("b%04d", lit(batchNo)))
      if (!newIdx.isEmpty)
        Merge.merge(spark, base, CuratePipeline.Frozen.NearDupIndex, newIdx,
          Seq("doc_id"), "batch")
    }
    timed("merge_norm_bank") {
      val normBatchNo = Layout.committedVersions(spark, base, CuratePipeline.Frozen.NormBank).last + 1
      val newNorms = frames("exact").select(col("norm_fp")).distinct()
        .withColumn("bucket", CuratePipeline.normBucket(normBatchNo))
      if (!newNorms.isEmpty)
        Merge.merge(spark, base, CuratePipeline.Frozen.NormBank, newNorms,
          Seq("norm_fp"), "bucket")
    }
    timed("merge_bench_grams") {
      val benchBatchNo = Layout.committedVersions(spark, base, CuratePipeline.Frozen.BenchGrams).last + 1
      val novel = CuratePipeline.benchGramSet(CuratePipeline.withTok(delta), cfg)
        .join(frozen.benchGrams, Seq("g"), "left_anti")
        .withColumn("batch", format_string("b%04d", lit(benchBatchNo)))
      if (!novel.isEmpty)
        Merge.merge(spark, base, CuratePipeline.Frozen.BenchGrams, novel,
          Seq("g"), "batch")
    }
    timed("accounting") {
      CuratePipeline.accounting(st.map { case (n, df) =>
        (n, if (n == "shards") shardDelta else df)
      }).collect()
    }
    println(f"PROBE total                 ${(System.nanoTime() - total0) / 1e9}%7.2f s")
    spark.stop()
  }
}
