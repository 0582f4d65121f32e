package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Persistent ANN index artifact + incremental maintenance
  * (reference: src/lakehouse/indexing/faiss_builder.py:181-284 save/load
  * with sidecars; incremental.py:39-276 anti-join + 30% rebuild rule).
  *
  * The "index" is relational: an IVF centroid table plus a cell-assigned
  * vector table, both parquet — so building, loading and searching are
  * ordinary partition-pruned Spark jobs, and the index scales with the
  * cluster instead of a single FAISS process.
  */
object VectorIndex {

  val RebuildRatio = 0.3 // incremental.py:200-276

  final case class Paths(dir: String) {
    def centroids: String = s"$dir/centroids.parquet"
    def assigned: String = s"$dir/assigned.parquet"
    def metadata: String = s"$dir/metadata.json"
  }

  /** Build and persist: train centroids, assign every vector to a cell. */
  def build(vectors: DataFrame, idCol: String, vecCol: String,
      nCells: Int, outDir: String): Unit = {
    val p = Paths(outDir)
    val cents = Similarity.trainIvfCentroids(vectors, idCol, vecCol, nCells)
    cents.write.mode("overwrite").parquet(p.centroids)
    val spark = vectors.sparkSession
    val assigned = Similarity.assignToNearest(
      vectors.select(col(idCol).as("_id"),
        graft.functions.VectorFunctions.vecAsDouble(col(vecCol)).as("_v")),
      spark.read.parquet(p.centroids))
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(p.assigned)
    writeMetadata(spark, p, nCells)
  }

  private def writeMetadata(spark: SparkSession, p: Paths, nCells: Int): Unit = {
    val n = spark.read.parquet(p.assigned).count()
    val path = new org.apache.hadoop.fs.Path(p.metadata)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    out.write(s"""{"n_vectors": $n, "n_cells": $nCells, "metric": "cosine"}""".getBytes("UTF-8"))
    out.close()
  }

  /** Incremental update: add only vectors whose ids aren't indexed yet
    * (left_anti, J6/E3); full rebuild when new/existing > 0.3. Returns the
    * action taken ("append" | "rebuild" | "noop"). */
  def update(vectors: DataFrame, idCol: String, vecCol: String,
      nCells: Int, outDir: String): String = {
    val spark = vectors.sparkSession
    val p = Paths(outDir)
    val existing = spark.read.parquet(p.assigned)
    val fresh = vectors.join(
      existing.select(col("_id").as(idCol)), Seq(idCol), "left_anti").cache()
    try {
      val nNew = fresh.count()
      if (nNew == 0) return "noop"
      val nExisting = existing.count()
      if (nExisting == 0 || nNew.toDouble / nExisting > RebuildRatio) {
        build(vectors, idCol, vecCol, nCells, outDir)
        "rebuild"
      } else {
        val assigned = Similarity.assignToNearest(
          fresh.select(col(idCol).as("_id"),
            graft.functions.VectorFunctions.vecAsDouble(col(vecCol)).as("_v")),
          spark.read.parquet(p.centroids))
        assigned.write.mode("append").partitionBy("cell_id").parquet(p.assigned)
        writeMetadata(spark, p, nCells)
        "append"
      }
    } finally fresh.unpersist()
  }

  /** Search the persisted index: nProbe-cell pruned top-k per query.
    * Partition pruning on cell_id means only the probed cells are read. */
  def search(spark: SparkSession, outDir: String, queries: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    graft.expressions.VectorExprs.register(spark)
    import graft.expressions.VectorExprs.vec_dot
    val p = Paths(outDir)
    val cents = spark.read.parquet(p.centroids)
    // norms BEFORE the join: one sqrt-dot per corpus/query row instead of
    // one per (query, candidate) pair after the fan-out
    val corpus = spark.read.parquet(p.assigned)
      .select(col("_id").as("neighbor_id"), col("_v").as("nv"), col("cell_id"))
      .withColumn("_nn", sqrt(vec_dot(col("nv"), col("nv"))))
    val qCells = {
      val j = broadcast(queries).crossJoin(broadcast(cents))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(graft.functions.VectorFunctions.cosine(col("qv"), col("centroid")).desc,
          col("cell_id"))
      j.withColumn("_r", row_number().over(w)).filter(col("_r") <= nProbe)
        .select(col("query_id"), col("qv"), col("cell_id"))
        .withColumn("_qn", sqrt(vec_dot(col("qv"), col("qv"))))
    }
    val cands = broadcast(qCells).join(corpus, "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
    val sims = cands
      .select(col("query_id"), col("neighbor_id"),
        round(vec_dot(col("qv"), col("nv")) / (col("_qn") * col("_nn")), 6).as("sim"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
