package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.index.HnswIndex

/** Scratch diagnostic: the X131 graph index's speed/recall surface on
  * the bench corpus (50k × 64-dim clustered + 50% noise, nCells = 64)
  * — the efSearch knob FAISS exposes, measured on ours. Two losses
  * compose, mirroring the IVF/PQ decomposition:
  *
  *   1. PROBE CEILING — a neighbor in an unprobed cell is unreachable
  *      at any ef (same ceiling as the float IVF index at the same
  *      nProbe, since both use the same coarse quantizer).
  *   2. BEAM MISS — within a probed cell, a beam of width ef can exit
  *      before reaching a true neighbor; ef ≥ cellN closes this loss
  *      exactly (backbone connectivity), so the ef column converges to
  *      the probe ceiling.
  *
  * Grid: nProbe × efSearch, recall@10 vs exact brute force + warm qps.
  * Usage: runMain graft.tools.HnswRecallProbe
  */
object HnswRecallProbe {

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val nVec = 50000L
    val dim = 64
    val nCells = 64
    val k = 10
    val emb = PqRecallProbe.clusteredCorpus(spark, nVec, dim, nCells)
    val dir = java.nio.file.Files.createTempDirectory("graft_hnsw_probe").toString + "/hnsw"
    HnswIndex.build(emb, "vec_id", "embedding", nCells, dir)
    val queries = emb.limit(200).select(col("vec_id").as("query_id"),
      VF.vecAsDouble(col("embedding")).as("qv")).localCheckpoint(true)
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      VF.vecAsDouble(col("embedding")).as("nv"))
    val exact = graft.operators.Similarity.topKExact(queries, corpus, k)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val denom = exact.count().toDouble
    println(f"${"nProbe"}%7s ${"ef"}%7s ${"recall@10"}%10s ${"qps"}%8s")
    for (nProbe <- Seq(2, 4, 8); ef <- Seq(16, 32, 64, 128, Int.MaxValue)) {
      def once(): Double = {
        val t0 = System.nanoTime()
        val n = HnswIndex.search(spark, dir, queries, k, ef, nProbe).count()
        require(n > 0)
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm plan + residency
      val qps = 200.0 / math.min(once(), once())
      val hits = HnswIndex.search(spark, dir, queries, k, ef, nProbe)
        .select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id")).count()
      val efLabel = if (ef == Int.MaxValue) "inf" else ef.toString
      println(f"$nProbe%7d $efLabel%7s ${hits / denom}%10.3f ${qps}%8.0f")
    }

    // Sims-touched per (query, cell) as the CELL grows — the structural
    // claim ("~ef·deg·log cellN sims instead of cellN") measured with a
    // counter, not asserted. Same 50k corpus regrouped into fewer,
    // bigger cells; each query searches its OWN cell at ef = 64.
    println(f"%n${"nCells"}%7s ${"cellN"}%8s ${"sims/q"}%8s ${"frac"}%8s")
    for (cells <- Seq(64, 16, 4)) {
      val d2 = java.nio.file.Files.createTempDirectory("graft_hnsw_cellsz").toString + "/hnsw"
      HnswIndex.build(emb, "vec_id", "embedding", cells, d2)
      val graphs = HnswIndex.loadGraph(spark, HnswIndex.Paths(d2)).collect()
      val byId = graphs.flatMap(g => g.ids.map(_ -> g)).toMap
      val qRows = queries.collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      val counter = new java.util.concurrent.atomic.LongAdder
      var nQ = 0
      qRows.foreach { case (qid, qv) =>
        byId.get(qid).foreach { g =>
          HnswIndex.searchCell(g, qv, 64, k, qid, counter); nQ += 1
        }
      }
      val avgCellN = graphs.map(_.n).sum.toDouble / graphs.length
      val simsPerQ = counter.sum().toDouble / nQ
      println(f"$cells%7d ${avgCellN}%8.0f ${simsPerQ}%8.0f ${simsPerQ / avgCellN}%8.3f")
      HnswIndex.evict(d2)
    }
    spark.stop()
  }
}
