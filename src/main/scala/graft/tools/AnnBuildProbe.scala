package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic: per-stage timing of VectorIndex.build at the
  * bench configuration (50k × 64d, 32 cells). Not a library surface.
  */
object AnnBuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    val dim = 64
    val nVec = 50000L
    val emb = spark.range(nVec).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("id") * dim + i), lit(1000)).cast("double") / 500.0 - 1.0)
          .cast("float")).as("embedding"))
      .localCheckpoint(true)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    // whole build, twice (first pass includes codegen/JIT warmup)
    val d1 = java.nio.file.Files.createTempDirectory("annp1").toString + "/ivf"
    t("build-total-cold")(graft.index.VectorIndex.build(emb, "vec_id", "embedding", 32, d1))
    val d2 = java.nio.file.Files.createTempDirectory("annp2").toString + "/ivf"
    t("build-total-warm")(graft.index.VectorIndex.build(emb, "vec_id", "embedding", 32, d2))
    // stage splits (mirrors build's internals)
    val n = t("count")(emb.count())
    val cents = t("train")(graft.operators.Similarity.trainIvfCentroids(
      emb, "vec_id", "embedding", 32, knownN = Some(n)))
    t("write-centroids")(cents.write.mode("overwrite").parquet(
      java.nio.file.Files.createTempDirectory("annp3").toString + "/c.parquet"))
    val assigned = graft.operators.Similarity.assignToNearest(
      emb.select(col("vec_id").as("_id"),
        graft.functions.VectorFunctions.vecAsDouble(col("embedding")).as("_v")), cents)
    t("assign-only")(assigned.count())
    val out = java.nio.file.Files.createTempDirectory("annp4").toString + "/a.parquet"
    t("assign+shuffle+write")(
      assigned.withColumn("_nn", sqrt(graft.expressions.VectorExprs.vec_dot(col("_v"), col("_v"))))
        .repartition(col("cell_id"))
        .write.mode("overwrite").partitionBy("cell_id").parquet(out))
    spark.stop()
  }
}
