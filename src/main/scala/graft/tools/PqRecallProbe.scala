package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.index.{PqIndex, VectorIndex}

/** Scratch diagnostic: decompose IVF-PQ serving recall on the bench
  * ann_pq corpus (50k × 64-dim clustered + 50% noise, nCells = 64) into
  * its two independent losses:
  *
  *   1. PROBE CEILING — recall of EXACT cosine restricted to the nProbe
  *      probed cells (the float IVF index at the same nProbe; both
  *      indexes train the same deterministic coarse quantizer on the
  *      same corpus, so the probed cell sets coincide). Rerank can never
  *      recover a neighbor in an unprobed cell, so this ceiling bounds
  *      EVERY configuration at that nProbe.
  *   2. QUANTIZATION DISTORTION — the gap between the ceiling and the
  *      raw ADC recall; the re-rank window w buys it back by exact
  *      re-scoring of the top-w ADC shortlist.
  *
  * Grid: nProbe × m × window, plus the whiten→PCA(r)→PQ composition at
  * equal code bytes. Usage: runMain graft.tools.PqRecallProbe
  */
object PqRecallProbe {

  def clusteredCorpus(spark: SparkSession, nVec: Long, dim: Int,
      nCells: Int): DataFrame = {
    val cluster = col("id") % nCells
    def u(seed: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      pmod(xxhash64(seed * dim + i), lit(1000)).cast("double") / 500.0 - 1.0
    spark.range(nVec).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (u(cluster, i) + u(col("id") + 7919L * nVec, i) * 0.5)
          .cast("float")).as("embedding"))
      .localCheckpoint(true)
  }

  /** Positive-control corpus for the PCA→PQ composition (VERDICT r10,
    * Next-round #5): [[clusteredCorpus]]'s hash components are ISOTROPIC
    * — every dimension carries equal variance, so PCA has nothing to
    * compact and the composition can only lose there. Real text
    * embeddings instead show a decaying spectrum (low effective rank);
    * this corpus models that by scaling dimension i's component by
    * 1/(1 + i/4) — variance spectrum ∝ (1 + i/4)⁻², effective rank ≈
    * dim/8 at dim 64. At equal code bytes, PCA(r=dim/2)→PQ(m/2) should
    * WIN here and lose on the isotropic twin: together the two corpora
    * turn the bench's single "measured negative" into a measured
    * per-corpus decision rule. */
  def anisotropicCorpus(spark: SparkSession, nVec: Long, dim: Int,
      nCells: Int): DataFrame = {
    val cluster = col("id") % nCells
    def u(seed: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      pmod(xxhash64(seed * dim + i), lit(1000)).cast("double") / 500.0 - 1.0
    spark.range(nVec).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => ((u(cluster, i) + u(col("id") + 7919L * nVec, i) * 0.5)
          / (lit(1.0) + i.cast("double") / 4.0))
          .cast("float")).as("embedding"))
      .localCheckpoint(true)
  }

  private def toSets(df: DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap

  private def recallOf(got: Map[Long, Set[Long]], want: Map[Long, Set[Long]]): Double = {
    val rs = want.keys.toSeq.map(q =>
      want(q).intersect(got.getOrElse(q, Set.empty)).size.toDouble / want(q).size)
    rs.sum / rs.size
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val (nVec, dim, nCells, k) = (50000L, 64, 64, 10)
    val base = java.nio.file.Files.createTempDirectory("graft_pqrecall").toString
    // `iso` (default) = the bench's isotropic clustered corpus;
    // `aniso` = the decaying-spectrum positive control
    val mode = args.headOption.getOrElse("iso")
    try {
      val emb = mode match {
        case "aniso" => anisotropicCorpus(spark, nVec, dim, nCells)
        case _ => clusteredCorpus(spark, nVec, dim, nCells)
      }
      println(s"corpus = $mode")
      val queries = emb.limit(200).select(col("vec_id").as("query_id"),
        VF.vecAsDouble(col("embedding")).as("qv")).localCheckpoint(true)
      val corpus = emb.select(col("vec_id").as("neighbor_id"),
        VF.vecAsDouble(col("embedding")).as("nv"))
      val exact = toSets(graft.operators.Similarity.topKExact(queries, corpus, k))

      val plainDir = s"$base/ivf"
      VectorIndex.build(emb, "vec_id", "embedding", nCells, plainDir)
      for (nProbe <- Seq(2, 4, 8)) {
        val ceil = recallOf(toSets(
          VectorIndex.search(spark, plainDir, queries, k, nProbe)), exact)
        println(f"probe_ceiling nProbe=$nProbe%-2d recall@$k = $ceil%.3f")
      }

      def timeWarm(body: => Long): Double = {
        body; val t0 = System.nanoTime(); body
        val a = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime(); body
        math.min(a, (System.nanoTime() - t1) / 1e9)
      }

      for (m <- Seq(8, 16)) {
        val dir = s"$base/pq_m$m"
        PqIndex.build(emb, "vec_id", "embedding", nCells, dir, m = m)
        for (nProbe <- Seq(4, 8)) {
          val adc = recallOf(toSets(
            PqIndex.search(spark, dir, queries, k, nProbe)), exact)
          val adcSec = timeWarm(PqIndex.search(spark, dir, queries, k, nProbe).count())
          println(f"pq m=$m%-2d nProbe=$nProbe%-2d ADC recall = $adc%.3f  qps = ${200 / adcSec}%.0f")
          for (w <- Seq(5 * k, 10 * k, 20 * k)) {
            val rr = recallOf(toSets(PqIndex.searchReranked(spark, dir, queries,
              emb, "vec_id", "embedding", k, nProbe, window = w)), exact)
            val rrSec = timeWarm(PqIndex.searchReranked(spark, dir, queries,
              emb, "vec_id", "embedding", k, nProbe, window = w).count())
            println(f"pq m=$m%-2d nProbe=$nProbe%-2d window=$w%-3d rerank recall = $rr%.3f  qps = ${200 / rrSec}%.0f")
          }
        }
      }

      // PCA(r) → PQ(m=8) at equal code bytes to raw m=8 — the FAISS
      // PCAR,PQm composition — in two flavors: raw-covariance PCA (pure
      // energy compaction) and whiten→PCA. Shortlist in projected space,
      // rerank against the ORIGINAL floats so the final metric is raw
      // cosine either way.
      def pcaVariant(tag: String, table: DataFrame, vecCol: String, r: Int): Unit = {
        val pModel = graft.operators.Pca.fit(table, col(vecCol), r)
        println(f"$tag%-12s r=$r variance_explained = ${pModel.varianceExplained}%.3f")
        val projected = graft.operators.Pca.transform(table, col(vecCol), pModel, "pv")
          .select(col("vec_id"), col("pv")).localCheckpoint(true)
        val qProjected = graft.operators.Pca.transform(
          table.limit(200), col(vecCol), pModel, "pv")
          .select(col("vec_id").as("query_id"), col("pv").as("qv")).localCheckpoint(true)
        val pcaDir = s"$base/pq_$tag"
        PqIndex.build(projected, "vec_id", "pv", nCells, pcaDir, m = 8)
        for (nProbe <- Seq(4, 8)) {
          val adc = recallOf(toSets(
            PqIndex.search(spark, pcaDir, qProjected, k, nProbe)), exact)
          println(f"$tag%-12s m=8 nProbe=$nProbe%-2d ADC recall = $adc%.3f")
          for (w <- Seq(5 * k, 10 * k, 20 * k)) {
            // shortlist from projected space; rerank joins the float store
            val shortlist = PqIndex.search(spark, pcaDir, qProjected, w, nProbe)
              .select("query_id", "neighbor_id")
            val q = queries.withColumn("_qn",
              sqrt(graft.expressions.VectorExprs.vec_dot(col("qv"), col("qv"))))
            val rrDf = broadcast(shortlist.join(q, "query_id"))
              .join(corpus, "neighbor_id")
              .select(col("query_id"), col("neighbor_id"),
                round(graft.expressions.VectorExprs.vec_dot(col("qv"), col("nv")) /
                  (col("_qn") * sqrt(graft.expressions.VectorExprs.vec_dot(col("nv"), col("nv")))), 6)
                  .as("sim"))
            val rr = recallOf(toSets(graft.operators.Similarity.perQueryTopK(rrDf, k)), exact)
            println(f"$tag%-12s m=8 nProbe=$nProbe%-2d window=$w%-3d rerank recall = $rr%.3f")
          }
        }
      }
      pcaVariant("pca32", emb.select(col("vec_id"),
        VF.vecAsDouble(col("embedding")).as("dv")), "dv", r = 32)
      val wModel = graft.operators.Whitening.fit(emb, col("embedding"))
      pcaVariant("whiten+pca32", graft.operators.Whitening
        .transform(emb, col("embedding"), wModel, "wv")
        .select(col("vec_id"), col("wv")), "wv", r = 32)
    } finally spark.stop()
  }
}
