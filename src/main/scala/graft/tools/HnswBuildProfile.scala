package graft.index

/** Single-cell build-rate profile for the X131 graph at PRODUCTION
  * density (r13 verdict task #1): one 10⁵-vector cell at the
  * reference-aligned m=16/efC=128 regime (faiss_builder.py:50-53 builds
  * its FAISS HNSW artifact on ~100k-vector corpora), timed WITHOUT any
  * Spark machinery so the number is the in-cell construction kernel
  * itself — the term `graphNodes` pays once per cell and the 100 TB
  * layout pays once per 10⁵-vector partition.
  *
  * No Spark session, no IO: deterministic mix64-generated vectors with
  * the same shape as HnswScaleProbe's corpus (d=64, values ≈ [-1.5,1.5],
  * mild per-cell cluster structure), straight into CellBuilder.
  *
  * Usage: runMain graft.index.HnswBuildProfile [n] [m] [efC] [reps]
  */
object HnswBuildProfile {
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(100000)
    val m = args.lift(1).map(_.toInt).getOrElse(16)
    val efC = args.lift(2).map(_.toInt).getOrElse(128)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val dim = 64

    // same corpus shape as HnswScaleProbe: cluster term + per-id noise
    def vecOf(id: Long): Array[Double] = {
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        val c = (mix64((id % 20) * dim + i) % 1000 + 1000) % 1000 / 500.0 - 1.0
        val u = (mix64(id * dim + i + 7919L) % 1000 + 1000) % 1000 / 500.0 - 1.0
        v(i) = c + u * 0.5
        i += 1
      }
      v
    }
    val vecs = Array.tabulate(n)(i => vecOf(i.toLong))

    var best = Double.MaxValue
    var edges = 0L
    for (r <- 0 until reps) {
      val b = new HnswIndex.CellBuilder(dim, m, efC, 42L, n)
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { b.add(i.toLong, vecs(i)); i += 1 }
      b.buildAll()
      val sec = (System.nanoTime() - t0) / 1e9
      edges = (0 until n).map(p => b.adjSeq(p).map(_.length.toLong).sum).sum
      println(f"PROFILE build rep=$r n=$n m=$m efC=$efC sec=$sec%.2f " +
        f"vec_per_s=${(n / sec).toLong} edges=$edges " +
        f"sims_per_ins=${b.statSims / n} admits_per_ins=${b.statAdmits / n} " +
        f"prunes_per_ins=${b.statPrunes / n} ns_per_sim=${sec * 1e9 / b.statSims}%.1f")
      if (sec < best) best = sec
    }
    println(f"PROFILE best n=$n m=$m efC=$efC sec=$best%.2f " +
      f"vec_per_s=${(n / best).toLong}")

    // concurrent-cell mode: T independent builders on T threads — the
    // shape graphNodes runs at on a multi-core executor (and what a
    // 1000-executor cluster runs per machine). Measures the aggregate
    // rate under shared memory bandwidth, the honest denominator for
    // the FAISS single-process baseline comparison.
    for (t <- Seq(4, 8, 16)) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(t)
      val t0 = System.nanoTime()
      val futs = (0 until t).map { w =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            val b = new HnswIndex.CellBuilder(dim, m, efC, 42L + w, n)
            var i = 0
            while (i < n) { b.add((w.toLong << 32) | i.toLong, vecs(i)); i += 1 }
            b.buildAll()
            b.adjSeq(0).map(_.length.toLong).sum
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROFILE conc threads=$t n_per_cell=$n m=$m efC=$efC sec=$sec%.2f " +
        f"agg_vec_per_s=${(n.toLong * t / sec).toLong} " +
        f"per_thread_vec_per_s=${(n / sec).toLong}")
    }
  }
}
