package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev-only: break the ingest-throughput bench into phases to see where
  * the time goes. Usage: IngestProfile [nRows]. */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val nRows = if (args.nonEmpty) args(0).toLong else 200000L
    val nEpisodes = 50
    val spark = GraftSession.create()
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest_prof")
    val inDir = tmp.resolve("in").toString
    val outDir = tmp.resolve("out").toString
    val src = spark.range(nRows).select(
      format_string("EP%03d", col("id") % nEpisodes).as("episode_id"),
      (floor(col("id") / nEpisodes) * 2.0).as("start"),
      (floor(col("id") / nEpisodes) * 2.0 + 1.9).as("end"),
      format_string("Speaker %d", col("id") % 7).as("speaker"),
      concat(lit("utterance text number "), col("id"),
        lit(" with a handful of plausible words attached")).as("text"))
    src.select(to_json(struct(col("episode_id"), col("start"), col("end"),
        col("speaker"), col("text"))).as("value"))
      .write.mode("overwrite").text(inDir)
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).foreach { st =>
      fs.rename(st.getPath, new org.apache.hadoop.fs.Path(p, st.getPath.getName + ".jsonl"))
    }
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    phase("read+parse only") {
      graft.ingest.Ingest.readJsonl(spark, inDir).count()
    }
    val (valid, errors) = graft.ingest.Ingest.validate(
      graft.ingest.Ingest.withEpisodeId(graft.ingest.Ingest.readJsonl(spark, inDir)))
    phase("validate (cache materialize)") { valid.count() }
    val norm = graft.ingest.Ingest.normalize(valid)
    phase("normalize (window + ids)") { norm.count() }
    phase("force id computation (no write)") {
      norm.agg(max(length(col("utterance_id")))).collect()
    }
    phase("write WITHOUT ids (flat)") {
      valid.withColumn("duration", col("end") - col("start"))
        .write.mode("overwrite").parquet(outDir + "_noid")
    }
    phase("partitioned write") {
      graft.ingest.Ingest.writeNormalized(norm, outDir)
    }
    phase("flat write") {
      graft.ingest.Ingest.writeNormalized(norm, outDir + "_flat",
        partitionByEpisode = false)
    }
    phase("errors.count") { errors.count() }
    spark.stop()
  }
}
