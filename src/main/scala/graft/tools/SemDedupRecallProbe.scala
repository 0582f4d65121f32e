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
  * meaningful testbed. `genc:<nVec>:<nClusters>:<noise>` is the
  * CORRELATED/mean-shifted variant (every dim adds one shared shifted
  * per-row signal on top of the cluster structure) — the regime
  * axis-aligned sign cells degenerate on (most rows land in one cell:
  * recall looks perfect while pruning vanishes), and the one whitened
  * bucketing exists for. For that regime the probe also prints each
  * variant's CANDIDATE PAIR MASS (Σ cell-pair counts) — the cost side
  * the recall number hides.
  *
  * Usage: runMain graft.tools.SemDedupRecallProbe <sfDir|gen:n:c:noise|genc:n:c:noise>
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
      val emb = (if (sfDir.startsWith("gen:") || sfDir.startsWith("genc:")) {
        val parts = sfDir.split(":")
        val Array(mode, n, c, noise) = parts.take(4)
        val (nVec, nClusters, dim) = (n.toLong, c.toInt, 64)
        val cluster = col("id") % nClusters
        def u(seed: Column, i: Column) =
          pmod(xxhash64(seed * dim + i), lit(1000)).cast("double") / 500.0 - 1.0
        // genc: one shared shifted per-row scalar rides on EVERY dim —
        // rank-1 correlation + positive mean, the sign-cell worst case.
        // Optional 5th field scales it (default 1.0 = the extreme regime;
        // ~0.35 gives a moderate-correlation corpus where the shared
        // direction biases but does not dominate cosine).
        val sharedScale = parts.lift(4).map(_.toDouble).getOrElse(1.0)
        val shared =
          if (mode == "genc")
            (lit(1.5) + u(col("id") + 104729L * nVec, lit(0)) * 2.0) * sharedScale
          else lit(0.0)
        spark.range(nVec).select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => (shared + u(cluster, i) + u(col("id") + 7919L * nVec, i) * noise.toDouble)
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
      // whitening throughput datapoint (the X102 kernel's own numbers:
      // one-pass fit, codegen'd map-only transform)
      locally {
        val n = emb.count()
        val t0 = System.nanoTime()
        val model = graft.operators.Whitening.fit(emb, col("embedding"))
        val fitSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        graft.operators.Whitening.transform(emb, col("embedding"), model, "_w")
          .select(count(lit(1)), sum(element_at(col("_w"), 1))).collect()
        val trSec = (System.nanoTime() - t1) / 1e9
        println(f"""{"whitening_fit_sec":$fitSec%.2f,"whitening_transform_rows_per_sec":${(n / trSec).toLong}}""")
      }
      // candidate-pair mass of the sign-cell assignments (the cost the
      // recall number hides when cells degenerate): Σ n_c(n_c−1)/2
      val wModel = graft.operators.Whitening.fit(emb, col("embedding"))
      def cellMass(cellCol: Column): Long =
        emb.groupBy(cellCol.as("c")).agg(count(lit(1)).as("n"))
          .agg(sum(expr("n * (n - 1) DIV 2"))).collect()(0).getLong(0)
      planeCounts.foreach { p =>
        val cells = 1 << p
        import graft.functions.{VectorFunctions => VF}
        val hypMass = cellMass(Similarity.hyperplaneCellId(col("embedding"), p))
        val hypWMass = cellMass(Similarity.hyperplaneCellId(
          graft.expressions.VectorExprs.whiten_vec(
            VF.vecAsDouble(col("embedding")), wModel.mean, wModel.wPacked), p))
        println(f"""{"cells":$cells,"hyperplane_cand_pairs":$hypMass,"hyperplane_whitened_cand_pairs":$hypWMass}""")
        def recall(s: Set[(Long, Long)]): Double =
          if (truth.isEmpty) 1.0 else s.intersect(truth).size.toDouble / truth.size
        val (ivf, ivfSec) = pairSet(Similarity.cosinePairsAboveIvf(
          emb, "vec_id", "embedding", threshold, nCells = cells))
        val (ivfW, ivfWSec) = pairSet(Similarity.cosinePairsAboveIvfWhitened(
          emb, "vec_id", "embedding", threshold, nCells = cells))
        val (hyp, hypSec) = pairSet(Similarity.cosinePairsAboveHyperplane(
          emb, "vec_id", "embedding", threshold, nPlanes = p))
        val (hypW, hypWSec) = pairSet(Similarity.cosinePairsAboveHyperplaneWhitened(
          emb, "vec_id", "embedding", threshold, nPlanes = p))
        println(f"""{"cells":$cells,"ivf_recall":${recall(ivf)}%.4f,"ivf_sec":$ivfSec%.1f,""" +
          f""""ivf_whitened_recall":${recall(ivfW)}%.4f,"ivf_whitened_sec":$ivfWSec%.1f,""" +
          f""""hyperplane_recall":${recall(hyp)}%.4f,"hyperplane_sec":$hypSec%.1f,""" +
          f""""hyperplane_whitened_recall":${recall(hypW)}%.4f,"hyperplane_whitened_sec":$hypWSec%.1f}""")
      }
    } finally spark.stop()
  }
}
