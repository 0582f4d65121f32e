package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}

/** K-means document clustering over an embedding column — topic bucketing
  * for corpus curation (diversity sampling, per-topic mixture control,
  * cluster-wise dedup). Reuses the IVF machinery: centroids train on a
  * hash-deterministic bounded sample on the driver
  * ([[Similarity.trainIvfCentroids]] — FAISS trains on samples for the
  * same reason), then every vector is assigned in ONE map-only codegen
  * pass against the broadcast centroid array. No iteration touches the
  * full corpus, so the 100 TB cost is one scan.
  */
object Clustering {

  /** Assign each row to its nearest centroid. Output: the `idCol`, the
    * double-cast vector, and `cluster_id`. */
  def assign(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 4): DataFrame = {
    val cents = Similarity.trainIvfCentroids(
      vectors, idCol, vecCol, nCells = k, iters = iters)
    Similarity.assignToNearest(
      vectors.select(col(idCol).as("_id"), VF.vecAsDouble(col(vecCol)).as("_v")),
      cents)
      .select(col("_id").as(idCol), col("_v").as("vector"),
        col("cell_id").as("cluster_id"))
  }

  /** Per-cluster audit: size, share, mean/max euclidean distance to the
    * cluster's OWN empirical mean, i.e. the within-cluster scatter a
    * curation run watches for degenerate/uneven topic buckets. The mean
    * comes from a posexplode + (cluster, dim) keyed sum — n·d skinny rows
    * through a keyed shuffle, never a whole cluster in one buffer — and
    * the k·d result re-assembles into k mean vectors (dim is small and
    * bounded, so the per-cluster collect_list is too). */
  def stats(assigned: DataFrame): DataFrame = {
    val counts = assigned.groupBy("cluster_id").agg(count(lit(1)).as("n"))
    val means = assigned
      .select(col("cluster_id"), posexplode(col("vector")).as(Seq("pos", "x")))
      .groupBy("cluster_id", "pos").agg(sum(col("x")).as("sx"))
      .groupBy("cluster_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("sx")))).as("ps"))
      .join(counts, Seq("cluster_id"))
      .select(col("cluster_id"), col("n"),
        transform(col("ps"), p => p.getField("sx") / col("n")).as("mean_vec"))
    val withDist = assigned.join(broadcast(means), Seq("cluster_id"))
      .withColumn("dist",
        sqrt(VF.dot(zip_with(col("vector"), col("mean_vec"), (a, b) => a - b),
          zip_with(col("vector"), col("mean_vec"), (a, b) => a - b))))
    val total = broadcast(assigned.agg(count(lit(1)).as("_total")))
    withDist.groupBy("cluster_id")
      .agg(
        count(lit(1)).as("n_members"),
        round((sum(col("dist").cast("decimal(20,12)")).cast("double") / count(lit(1))), 6)
          .as("avg_dist"),
        round(max(col("dist")), 6).as("max_dist"))
      .crossJoin(total)
      .withColumn("share_pct", round(lit(100.0) * col("n_members") / col("_total"), 4))
      .select("cluster_id", "n_members", "share_pct", "avg_dist", "max_dist")
      .orderBy("cluster_id")
  }
}
