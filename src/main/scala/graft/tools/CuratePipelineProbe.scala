package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic: delta-vs-full cost of the composed curate
  * pipeline (X129/X130) at a ladder scale factor — the end-to-end form
  * of IncrementalDedupProbe. Full run on 99% of the corpus, then the
  * held-out 1% as an incremental batch through the persisted index +
  * frozen parameters + MERGE. Usage:
  *   runMain graft.tools.CuratePipelineProbe [sfDir]
  */
object CuratePipelineProbe {

  /** Soak mode (`soak` as arg 2): full run on the doc_id%100>=10 side,
    * then TEN sequential 1%-slice delta batches — prints per-batch wall
    * seconds and kept-shard rows so SCALE.md can show cost-per-batch
    * staying flat (the bank grows 10×, the probe must not). */
  private def soak(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft_curate_soak").toString
    val docs = graft.Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val t0 = System.nanoTime()
    graft.pipeline.CuratePipeline.run(spark, docs.filter(pmod(col("doc_id"), lit(100)) >= 10), base)
    println(f"SOAK full(90%%): ${(System.nanoTime() - t0) / 1e9}%.1f s")
    (0 until 10).foreach { k =>
      val batch = docs.filter(pmod(col("doc_id"), lit(100)) === k)
      val t1 = System.nanoTime()
      val acc = graft.pipeline.CuratePipeline.runIncremental(spark, batch, base)
        .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")).toMap
      println(f"SOAK batch$k%02d: ${(System.nanoTime() - t1) / 1e9}%5.1f s  " +
        f"raw=${acc("raw")}%-6d kept_shards=${acc("shards")}")
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("soak")) {
      try soak(spark, dir) finally spark.stop()
      return
    }
    try {
      val base = java.nio.file.Files.createTempDirectory("graft_curate_probe").toString
      val docs = graft.Tables.documentsSpread(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val full = docs.filter(pmod(col("doc_id"), lit(100)) =!= 7)
      val delta = docs.filter(pmod(col("doc_id"), lit(100)) === 7)

      val t0 = System.nanoTime()
      val accFull = graft.pipeline.CuratePipeline.run(spark, full, base)
        .collect()
      val fullSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val accDelta = graft.pipeline.CuratePipeline.runIncremental(spark, delta, base)
        .collect()
      val deltaSec = (System.nanoTime() - t1) / 1e9

      def row(rs: Array[org.apache.spark.sql.Row], stage: String): Long =
        rs.find(_.getAs[String]("stage") == stage).map(_.getAs[Long]("n_docs")).getOrElse(-1L)
      println(f"PROBE curate full : ${fullSec}%.1f s  " +
        f"raw=${row(accFull, "raw")} shards=${row(accFull, "shards")}")
      println(f"PROBE curate delta: ${deltaSec}%.1f s  " +
        f"raw=${row(accDelta, "raw")} shards=${row(accDelta, "shards")}  " +
        f"ratio=${fullSec / deltaSec}%.1f x")
      // per-stage accounting for the SCALE.md table
      accFull.foreach(r => println(s"FULL  ${r.mkString(" ")}"))
      accDelta.foreach(r => println(s"DELTA ${r.mkString(" ")}"))

      // fp-bucket pruning: bank bytes a delta probe reads vs bank total,
      // for the 1% delta and for a 5-doc microbatch (the small-frequent-
      // batch case the bucketing exists for)
      import graft.functions.{Hashes, TextFunctions => TF}
      import graft.pipeline.{CuratePipeline => CP}
      def dirBytes(p: String): Long = {
        val root = java.nio.file.Paths.get(p)
        val s = java.nio.file.Files.walk(root)
        try {
          val it = s.iterator(); var n = 0L
          while (it.hasNext) { val q = it.next()
            if (java.nio.file.Files.isRegularFile(q)) n += java.nio.file.Files.size(q) }
          n
        } finally s.close()
      }
      val v = graft.ingest.Layout.committedVersions(spark, base, CP.Frozen.NormBank).last
      val eff = graft.ingest.Merge.effectiveDirs(spark, base, CP.Frozen.NormBank, v)
      val total = eff.values.map(dirBytes).sum
      Seq("delta1pct" -> delta, "micro5doc" -> delta.limit(5)).foreach { case (label, d) =>
        val hit = d.select(pmod(
            Hashes.polyHash(TF.normalizeWs(col("text"))) * lit(2147483648L) +
            Hashes.polyHash2(TF.normalizeWs(col("text"))),
            lit(CP.NormBankBuckets.toLong)).as("b"))
          .distinct().collect().map(r => f"f${r.getLong(0)}%03d").toSet
        val pruned = eff.filter { case (name, _) =>
          hit.exists(sfx => name.endsWith("-" + sfx)) }.values.map(dirBytes).sum
        println(f"PROBE bank-prune $label%-10s buckets=${hit.size}/${CP.NormBankBuckets} " +
          f"bytes=$pruned%,d of $total%,d (${100.0 * pruned / math.max(total, 1)}%.1f%%)")
      }
    } finally spark.stop()
  }
}
