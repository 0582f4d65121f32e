package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.VectorExprs
import graft.functions.{VectorFunctions => VF}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Semantic contract: "top-k neighbors by cosine" (reference:
  * src/lakehouse/indexing/faiss_builder.py:60-147 HNSW;
  * quality/metrics/embedding.py:408-472 exact top-k). Exact brute force
  * is the oracle-checkable baseline; IVF coarse quantization is the scale
  * path — it turns the global crossJoin into a per-cell join, i.e. a
  * partition-pruned search, the Spark analog of FAISS's nlist/nprobe.
  */
object Similarity {

  /** Exact top-k by cosine: queries × corpus, windowed rank.
    * queries: (query_id, qv double[]); corpus: (neighbor_id, nv double[]).
    * Broadcast the (small) query side so the corpus never shuffles. */
  def topKExact(queries: DataFrame, corpus: DataFrame, k: Int,
      roundDp: Int = 6): DataFrame = {
    VectorExprs.register(queries.sparkSession)
    // norms once per vector (columns, so they survive the join), codegen
    // dot per pair: dot/(sqrt·sqrt) keeps oracle-bit-exact association
    val q = queries.withColumn("_qn", sqrt(VectorExprs.vec_dot(col("qv"), col("qv"))))
    val c = corpus.withColumn("_nn", sqrt(VectorExprs.vec_dot(col("nv"), col("nv"))))
    val joined = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
    val sims = joined.select(
      col("query_id"), col("neighbor_id"),
      round(VectorExprs.vec_dot(col("qv"), col("nv")) / (col("_qn") * col("_nn")), roundDp)
        .as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Deterministic IVF training: cells seeded by `id % nCells`, then
    * `iters` Lloyd steps. Centroid components are DECIMAL-averaged so the
    * result is independent of row order (and hence reproducible on any
    * cluster layout). Returns (cell_id, centroid double[]). */
  def trainIvfCentroids(vectors: DataFrame, idCol: String, vecCol: String,
      nCells: Int, iters: Int = 2): DataFrame = {
    val v = vectors.select(col(idCol).as("_id"), col(vecCol).as("_v"))
    // hash-based seeding: works for any id type, deterministic everywhere
    var assigned = v.withColumn("cell_id", pmod(xxhash64(col("_id")), lit(nCells)).cast("int"))
    var centroids: DataFrame = null
    for (_ <- 0 to iters) {
      centroids = averageByCell(assigned)
      assigned = assignToNearest(v, centroids)
    }
    centroids
  }

  /** Elementwise decimal-exact mean vector per cell (posexplode → agg →
    * re-collect in position order). */
  private def averageByCell(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell_id"), posexplode(col("_v")).as(Seq("pos", "x")))
      .groupBy("cell_id", "pos")
      .agg((sum(col("x").cast("decimal(30,12)")) / count(lit(1))).cast("double").as("m"))
      .groupBy("cell_id")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("centroid"))

  /** Assign each vector to its nearest centroid (broadcast centroids —
    * nCells is small by construction, so this is a map-only stage). */
  def assignToNearest(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val joined = vectors.crossJoin(broadcast(centroids))
    val w = Window.partitionBy(col("_id"))
      .orderBy(VF.cosine(col("_v"), col("centroid")).desc, col("cell_id"))
    joined.withColumn("_r", row_number().over(w))
      .filter(col("_r") === 1)
      .select(col("_id"), col("_v"), col("cell_id"))
  }

  /** IVF search: route each query to its nProbe nearest cells, join only
    * those cells' vectors, rank within query. Same output shape as
    * [[topKExact]]; recall < 1 by design (measured in tests). */
  def topKIvf(spark: SparkSession, queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val assigned = assignToNearest(
      corpus.select(col("neighbor_id").as("_id"), col("nv").as("_v")), centroids)
      .select(col("_id").as("neighbor_id"), col("_v").as("nv"), col("cell_id"))
    val qCells = {
      val j = broadcast(queries).crossJoin(broadcast(centroids))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(VF.cosine(col("qv"), col("centroid")).desc, col("cell_id"))
      j.withColumn("_r", row_number().over(w)).filter(col("_r") <= nProbe)
        .select(col("query_id"), col("qv"), col("cell_id"))
    }
    val candidates = broadcast(qCells).join(assigned, "cell_id")
      .filter(col("query_id") =!= col("neighbor_id"))
    val sims = candidates.select(
      col("query_id"), col("neighbor_id"),
      round(VF.cosine(col("qv"), col("nv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    sims.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** All pairs (a < b) with cosine above a threshold, blocked by optional
    * key columns (embedding-based near-dup detection). */
  def cosinePairsAbove(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, blockCols: Seq[String] = Nil): DataFrame = {
    val base = df.select((blockCols.map(col) :+ col(idCol) :+
      VF.vecAsDouble(col(vecCol)).as("_v")): _*)
    val a = base.select((blockCols.map(col) :+ col(idCol).as("id_a") :+ col("_v").as("va")): _*)
    val b = base.select((blockCols.map(col) :+ col(idCol).as("id_b") :+ col("_v").as("vb")): _*)
    VectorExprs.register(df.sparkSession)
    val an = a.withColumn("_na", sqrt(VectorExprs.vec_dot(col("va"), col("va"))))
    val bn = b.withColumn("_nb", sqrt(VectorExprs.vec_dot(col("vb"), col("vb"))))
    val joined = if (blockCols.nonEmpty) an.join(bn, blockCols) else an.crossJoin(bn)
    joined.filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(VectorExprs.vec_dot(col("va"), col("vb")) / (col("_na") * col("_nb")), 6))
      .filter(col("sim") >= threshold)
      .select((blockCols.map(col) :+ col("id_a") :+ col("id_b") :+ col("sim")): _*)
  }
}
