package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Diagnostic CLI: SemDeDup cell-variant recall head-to-head. The two
  * cell quantizers behind [[graft.operators.Similarity]]'s SemDeDup —
  * learned IVF centroids (`cosinePairsAboveIvf`) vs data-independent
  * sign-bit hyperplanes (`cosinePairsAboveHyperplane`) — both trade
  * recall for the Σ cell² pair bound. This probe measures that trade on
  * the bench embedding corpus at equal cell counts: ground truth is the
  * UNBLOCKED exact pair set, and each variant's pair recall is
  * |found ∩ truth| / |truth|. Wall seconds per variant ride along
  * (hyperplane assignment is map-only; IVF pays a training pass).
  *
  * The corpus arg is a parquet sf dir OR `gen:<nVec>:<nClusters>:<noise>`
  * — the same clustered center+noise generator as the pruned-ANN bench
  * phase (`Bench.annPrunedThroughput`). The bench sf tables' embeddings
  * are near-uniform random (14 pairs above 0.5 cosine in the whole sf0.1
  * corpus), which exercises NEITHER quantizer; SemDeDup's contract, like
  * IVF's, assumes clusterable data, so the generated corpus is the
  * meaningful testbed.
  *
  * Usage: runMain graft.tools.SemDedupRecallProbe <sfDir|gen:n:c:noise>
  *        [threshold=0.9] [planeCounts=3,4,5]  (cells = 2^planes, both variants)
  */
object SemDedupRecallProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.9)
    val planeCounts = args.lift(2).map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(3, 4, 5))
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity
    try {
      val emb = (if (sfDir.startsWith("gen:")) {
        val Array(_, n, c, noise) = sfDir.split(":")
        val (nVec, nClusters, dim) = (n.toLong, c.toInt, 64)
        val cluster = col("id") % nClusters
        def u(seed: Column, i: Column) =
          pmod(xxhash64(seed * dim + i), lit(1000)).cast("double") / 500.0 - 1.0
        spark.range(nVec).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => (u(cluster, i) + u(col("id") + 7919L * nVec, i) * noise.toDouble)
              .cast("float")).as("embedding"))
      } else spark.read.parquet(s"$sfDir/embeddings.parquet"))
        .select(col("vec_id"), col("embedding"))
      emb.cache().count()
      def pairSet(df: org.apache.spark.sql.DataFrame): (Set[(Long, Long)], Double) = {
        val t0 = System.nanoTime()
        val s = df.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        (s, (System.nanoTime() - t0) / 1e9)
      }
      val (truth, tSec) = pairSet(Similarity.cosinePairsAbove(
        emb, "vec_id", "embedding", threshold))
      println(f"""{"sf_dir":"$sfDir","threshold":$threshold,"true_pairs":${truth.size},"exact_sec":$tSec%.1f}""")
      planeCounts.foreach { p =>
        val cells = 1 << p
        val (ivf, ivfSec) = pairSet(Similarity.cosinePairsAboveIvf(
          emb, "vec_id", "embedding", threshold, nCells = cells))
        val (hyp, hypSec) = pairSet(Similarity.cosinePairsAboveHyperplane(
          emb, "vec_id", "embedding", threshold, nPlanes = p))
        def recall(s: Set[(Long, Long)]): Double =
          if (truth.isEmpty) 1.0 else s.intersect(truth).size.toDouble / truth.size
        println(f"""{"cells":$cells,"ivf_recall":${recall(ivf)}%.4f,"ivf_sec":$ivfSec%.1f,""" +
          f""""hyperplane_recall":${recall(hyp)}%.4f,"hyperplane_sec":$hypSec%.1f}""")
      }
    } finally spark.stop()
  }
}
