package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev-only: the bench's streaming near-dup run with per-batch progress
  * details (operator durations, state commit times) printed, reps in one
  * JVM. Usage: StreamNearDupProbe [nDocs] [reps]. */
object StreamNearDupProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 200000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft_nd_probe")
    val inDir = tmp.resolve("in").toString
    val eff = when(col("id").between(100000L, 104999L), col("id") - 100000L)
      .otherwise(col("id"))
    val txt = concat_ws(" ",
      (0 until 12).map(i => format_string("w%d", eff * 13 + i)): _*)
    val isLong = pmod(col("id"), lit(100)) === 99
    val longTxt = concat_ws(" ", transform(sequence(lit(0), lit(4499)),
      j => format_string("x%d_%d", eff, j)))
    spark.range(nDocs).select(
        col("id").as("doc_id"),
        timestamp_seconds(lit(1700000000L) + floor(col("id") / 1000)).as("ts"),
        when(isLong, longTxt).otherwise(txt).as("text"))
      .repartitionByRange(32, col("ts"))
      .write.mode("overwrite").parquet(inDir)
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(inPath).filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName).zipWithIndex.foreach { case (st, i) =>
        fs.setTimes(st.getPath, 1000000000000L + i * 60000L, -1)
      }
    val schema = spark.read.parquet(inDir).schema
    // batch-mode equivalent of the MAP side (scan -> shingle -> minhash ->
    // sorted-hash/slice -> band explode, no stateful operator): its wall
    // is the non-state floor of the streaming run
    for (rep <- 1 to reps) {
      graft.expressions.HashFunctions.register(spark)
      graft.expressions.TextExprs.register(spark)
      graft.expressions.HashFunctions.registerMinhash(spark, "graft_minhash_12",
        (0 until 12).map(graft.operators.Dedup.affineA).toArray,
        (0 until 12).map(graft.operators.Dedup.affineB).toArray)
      val t0 = System.nanoTime()
      spark.read.parquet(inDir)
        .select(col("doc_id"), col("ts"), graft.functions.TextFunctions.tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("ts"),
          graft.expressions.TextExprs.distinct_word_ngrams(col("tk"), 2).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("hs", graft.expressions.HashFunctions.poly_hash_array(col("sh")))
        .withColumn("sig", call_function("graft_minhash_12", col("hs")))
        .withColumn("hsh", slice(graft.expressions.TextExprs.xx_sorted_hash(col("sh")), 1, 1024))
        .withColumn("sz", size(col("sh")))
        .withColumn("band", explode(array((0 until 3).map { b =>
          struct(lit(b).as("band_id"),
            concat_ws(",", (0 until 4).map(i => get(col("sig"), lit(b * 4 + i))): _*)
              .as("band_key"))
        }: _*)))
        .select(col("band.band_id"), col("band.band_key"), col("doc_id"),
          col("hsh"), col("sz"), col("ts"))
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] map-side batch rep$rep: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (args.length > 2 && args(2) == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    for (rep <- 1 to reps) {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8).parquet(inDir)
      val pairs = graft.streaming.StreamingNearDup.streamingNearDups(
        stream, "doc_id", col("text"), "ts", delayMs = 600000L,
        shingleWords = 2, k = 12, bands = 3, threshold = 0.5,
        maxStoredHashes = graft.streaming.StreamingNearDup.DefaultMaxStoredHashes)
      val ckpt = java.nio.file.Files.createTempDirectory("graft_nd_probe_ck").toString
      val t0 = System.nanoTime()
      val q = pairs.toDF().writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.format("noop").mode("overwrite").save()
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rep$rep total: $sec%.3f s (${nDocs / sec}%.0f docs/s)")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        val st = p.stateOperators.headOption
        println(s"[probe]  batch ${p.batchId}: rows=${p.numInputRows} " +
          s"batchMs=${d.get("triggerExecution")} addBatch=${d.get("addBatch")} " +
          s"getBatch=${d.get("getBatch")} planning=${d.get("queryPlanning")} " +
          s"walCommit=${d.get("walCommit")} stateCommit=" +
          st.map(_.customMetrics.toString).getOrElse("-"))
      }
    }
    spark.stop()
  }
}
