package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ingest.{Layout, Merge}

/** Multi-batch incremental soak (VERDICT r11, next-round #5): a full run
  * on 60% of the sf0.001 corpus, then TEN sequential delta batches
  * through [[CuratePipeline.runIncremental]], asserting the properties
  * one batch cannot prove:
  *
  *  - per-batch accounting stays sane (raw counts exact, keeps monotone
  *    through the gate stages) for every batch in the sequence;
  *  - the near-dup index and norm bank grow by exactly one batch of
  *    partitions per keeping batch — never a rewrite of an earlier
  *    batch's dirs (the O(delta) append contract, sustained);
  *  - the shards layer stays key-consistent (no duplicate (doc_id,
  *    copy)) and its row count tracks the summed per-batch accounting;
  *  - a MID-SEQUENCE resubmission of an already-curated batch is a
  *    no-op: every doc dies at exact and no layer gains a version.
  */
class CurateSoakSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"), col("lang"), col("source"))

  // batches 0..9 = doc_id%25 ∈ {0..9}; the full run takes the rest
  private def batchDocs(k: Int) = docs.filter(pmod(col("doc_id"), lit(25)) === k)

  test("ten sequential delta batches: linear bank growth, flat semantics, mid-sequence resubmit no-op") {
    val base = Files.createTempDirectory("graft_curate_soak").toString
    // flatten at depth 4 so the ten-batch soak crosses TWO shard
    // manifest checkpoints with merges stacked between them (r13 verdict
    // #7) — the second checkpoint generation is where O(batches) creep
    // or a protected-version bug would first show
    val soakCfg = CurateConfig(compactChainDepth = 4)
    CuratePipeline.run(spark, docs.filter(pmod(col("doc_id"), lit(25)) >= 10), base, soakCfg)

    def versionsOf(layer: String) =
      Layout.committedVersions(spark, base, layer).last
    def dirsOf(layer: String) =
      Merge.effectiveDirs(spark, base, layer, versionsOf(layer)).keySet

    var expectedShardRows = Layout.loadLatest(spark, base, "curated/shards").count()
    val gateOrder = Seq("raw", "exact", "neardup", "quality", "decontam", "curriculum")

    // shards DATA files: the soak's strongest scale assertion is that no
    // batch — INCLUDING the chain-flatten batch — ever rewrites or
    // copies a previously-written shard file (the flatten is a
    // metadata-only manifest checkpoint, not an O(corpus) rewrite)
    def shardFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      walk(new java.io.File(s"$base/curated/shards"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getAbsolutePath, f.lastModified())).toMap
    }
    var shardCheckpoints = 0

    (0 until 10).foreach { k =>
      val batch = batchDocs(k)
      val nRaw = batch.count()
      val idxDirsBefore = dirsOf(CuratePipeline.Frozen.NearDupIndex)
      val bankDirsBefore = dirsOf(CuratePipeline.Frozen.NormBank)
      val shardFilesBefore = shardFiles()
      val shardDepthBefore = Merge.chainDepth(spark, base, "curated/shards")

      val acc = CuratePipeline.runIncremental(spark, batch, base, soakCfg)
        .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap

      // accounting sanity, every batch
      assert(acc("raw") == nRaw, s"batch $k raw ${acc("raw")} != $nRaw")
      gateOrder.sliding(2).foreach { case Seq(a, b) =>
        assert(acc(b) <= acc(a), s"batch $k: $b (${acc(b)}) > $a (${acc(a)})")
      }
      assert(acc("shards") == acc("mixture"), s"batch $k shards != mixture")
      expectedShardRows += acc("shards")

      // index growth: exactly one new batch dir per keeping batch, old
      // dirs untouched
      val idxDirs = dirsOf(CuratePipeline.Frozen.NearDupIndex)
      if (acc("neardup") > 0) {
        assert((idxDirs -- idxDirsBefore).size == 1,
          s"batch $k: index gained ${(idxDirs -- idxDirsBefore).size} dirs")
        assert((idxDirsBefore -- idxDirs).isEmpty, s"batch $k dropped index dirs")
      } else assert(idxDirs == idxDirsBefore)

      // norm bank growth: one new bNNNN batch of bucket dirs per keeping
      // batch; earlier batches' buckets never touched
      val bankDirs = dirsOf(CuratePipeline.Frozen.NormBank)
      if (acc("exact") > 0) {
        val newDirs = bankDirs -- bankDirsBefore
        val prefixes = newDirs.map(_.replaceAll("-f\\d+$", ""))
        assert(newDirs.nonEmpty && prefixes.size == 1,
          s"batch $k: new bank dirs span batches $prefixes")
        assert((bankDirsBefore -- bankDirs).isEmpty, s"batch $k dropped bank dirs")
      } else assert(bankDirs == bankDirsBefore)

      // merge-chain depth stays bounded: reads of a merged layer cost
      // O(chain), so runIncremental flattens at the CompactChainDepth
      // threshold — 10 appends must never leave a deeper chain behind
      Seq("curated/shards", CuratePipeline.Frozen.NearDupIndex,
        CuratePipeline.Frozen.NormBank, CuratePipeline.Frozen.BenchGrams)
        .foreach { l =>
          val d = Merge.chainDepth(spark, base, l)
          assert(d < soakCfg.compactChainDepth,
            s"batch $k: $l merge chain depth $d not bounded")
        }

      // shards flatten is METADATA-ONLY: no pre-existing data file is
      // ever rewritten, moved or deleted by any batch, and each batch's
      // new data files land in at most ONE new version dir (the batch's
      // own merge) — a checkpoint version contributes zero data files
      val shardFilesAfter = shardFiles()
      shardFilesBefore.foreach { case (p, t) =>
        assert(shardFilesAfter.get(p).contains(t),
          s"batch $k rewrote or removed shard data file $p")
      }
      val newVDirs = (shardFilesAfter.keySet -- shardFilesBefore.keySet)
        .flatMap("/shards/(v\\d+)/".r.findFirstMatchIn(_).map(_.group(1)))
      assert(newVDirs.size <= 1,
        s"batch $k wrote shard data into ${newVDirs.size} version dirs: $newVDirs")
      if (Merge.chainDepth(spark, base, "curated/shards") < shardDepthBefore) {
        // the flatten fired this batch: depth reset by a manifest
        // checkpoint, not a rewrite
        shardCheckpoints += 1
        assert(Merge.chainDepth(spark, base, "curated/shards") == 0,
          s"batch $k: flatten did not reset the shards chain")
        val ckDir = Layout.versionedDir(base, "curated/shards",
          Layout.committedVersions(spark, base, "curated/shards").last)
        assert(Merge.manifestInfo(spark, ckDir).nonEmpty,
          s"batch $k: depth reset without a manifest checkpoint at $ckDir")
      }

      // mid-sequence resubmit: after batch 5, replay batch 2 — no-op
      if (k == 5) {
        val vIdx = versionsOf(CuratePipeline.Frozen.NearDupIndex)
        val vBank = versionsOf(CuratePipeline.Frozen.NormBank)
        val vShards = versionsOf("curated/shards")
        val acc2 = CuratePipeline.runIncremental(spark, batchDocs(2), base, soakCfg)
          .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
        CuratePipeline.StageNames.drop(1).foreach { s =>
          assert(acc2(s) == 0L, s"resubmitted batch leaked ${acc2(s)} into $s")
        }
        assert(versionsOf(CuratePipeline.Frozen.NearDupIndex) == vIdx &&
          versionsOf(CuratePipeline.Frozen.NormBank) == vBank &&
          versionsOf("curated/shards") == vShards,
          "resubmission published a version — not a no-op")
      }
    }

    // the soak must cross TWO checkpoint generations, or the
    // metadata-only and stacked-merge assertions above never ran against
    // a checkpoint-on-checkpoint chain
    assert(shardCheckpoints >= 2,
      s"soak crossed only $shardCheckpoints shard checkpoints — need 2+")

    // shards layer: key-consistent and row count == full + Σ deltas
    val shards = Layout.loadLatest(spark, base, "curated/shards")
    assert(shards.count() == expectedShardRows)
    assert(shards.groupBy("doc_id", "copy").count()
      .filter(col("count") > 1).count() == 0)

    // the bank's fps stay globally distinct across all ten appends
    val bank = Layout.loadLatest(spark, base, CuratePipeline.Frozen.NormBank)
    assert(bank.groupBy("norm_fp").count().filter(col("count") > 1).count() == 0)

    // vacuum safety across BOTH checkpoint generations: every version
    // either manifest's chain references is protected — an aggressive
    // vacuum (retention 0) must not change what the head resolves to
    val before = Layout.loadLatest(spark, base, "curated/shards")
      .orderBy("doc_id", "copy").collect().toSeq
    Layout.vacuum(spark, base, "curated/shards", retentionMs = 0L)
    val after = Layout.loadLatest(spark, base, "curated/shards")
      .orderBy("doc_id", "copy").collect().toSeq
    assert(after == before,
      "vacuum reclaimed a version a checkpoint manifest still references")
  }
}
