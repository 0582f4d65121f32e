package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => VF}
import graft.index.HnswIndex

/** X131 at PRODUCTION cell sizes (r12 verdict #1 — the one 100×-scale
  * claim that rested on a 12.5k-cell trend line): a 2M-vector corpus in
  * 20 cells of ~10⁵ vectors each (the reference's own ANN baseline
  * regime — faiss_builder.py trains on ~100k-vector artifacts), run
  * through build (float / int8 / PQ), the serving grid, and the
  * sims-per-query counter, so "~ef·deg·log cellN beats the cellN scan"
  * is a measurement at the cell size the 100 TB layout actually uses.
  *
  * The scan baseline is the PRODUCT cell scan — `VectorIndex.search`
  * at the same nProbe (exact within probed cells, so its recall IS the
  * probe ceiling) — and the graph rows show how close the beam gets to
  * that ceiling at a fraction of the in-cell sims.
  *
  * Usage: SPARK_DRIVER_MEM=48g runMain graft.tools.HnswScaleProbe [nVec]
  */
object HnswScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val nVec = args.headOption.map(_.toLong).getOrElse(2000000L)
    val dim = 64
    val nCells = math.max(2, (nVec / 100000L).toInt) // ~1e5 vectors/cell
    val k = 10
    val nQ = 200

    val cluster = col("id") % nCells
    def u(seed: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      pmod(xxhash64(seed * dim + i), lit(1000)).cast("double") / 500.0 - 1.0
    val emb = spark.range(nVec).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (u(cluster, i) + u(col("id") + 7919L * nVec, i) * 0.5)
          .cast("float")).as("embedding"))
      .localCheckpoint(true)

    def bytesUnder(dir: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
      walk(new java.io.File(dir))
    }
    def timedBuild(tag: String)(f: String => Unit): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_scale_$tag").toString + "/hnsw"
      val t0 = System.nanoTime()
      f(dir)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE build $tag%-6s n=$nVec cells=$nCells sec=$sec%.1f " +
        f"vec_per_s=${(nVec / sec).toLong} graph_bytes=${bytesUnder(HnswIndex.Paths(dir).graph)}")
      dir
    }

    // reference-aligned graph parameters for 1e5-vector cells: the
    // m=8/efC=64 defaults were tuned on sub-1k cells and cap recall
    // well below the probe ceiling at this size (measured 0.73@ef=512);
    // the reference's FAISS artifact uses M=32/efC=64 on exactly this
    // corpus size (faiss_builder.py:50-53)
    val gM = 16
    val gEfc = 128
    val dirF = timedBuild("float") { d =>
      HnswIndex.build(emb, "vec_id", "embedding", nCells, d, m = gM,
        efConstruction = gEfc) }
    val dirI = timedBuild("int8") { d =>
      HnswIndex.build(emb, "vec_id", "embedding", nCells, d, m = gM,
        efConstruction = gEfc, quantized = true) }
    val dirP = timedBuild("pq16") { d =>
      HnswIndex.build(emb, "vec_id", "embedding", nCells, d, m = gM,
        efConstruction = gEfc, pqM = 16) }
    // the product scan baseline at the same coarse quantizer
    val dirV = java.nio.file.Files.createTempDirectory("graft_scale_ivf").toString + "/ivf"
    val tV = System.nanoTime()
    graft.index.VectorIndex.build(emb, "vec_id", "embedding", nCells, dirV)
    println(f"PROBE build ivf    n=$nVec cells=$nCells sec=${(System.nanoTime() - tV) / 1e9}%.1f")

    val queries = emb.limit(nQ).select(col("vec_id").as("query_id"),
      VF.vecAsDouble(col("embedding")).as("qv")).localCheckpoint(true)
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      VF.vecAsDouble(col("embedding")).as("nv"))
    val tOracle = System.nanoTime()
    val exact = graft.operators.Similarity.topKExact(queries, corpus, k)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val denom = exact.count().toDouble
    println(f"PROBE oracle exact_sec=${(System.nanoTime() - tOracle) / 1e9}%.1f pairs=${denom.toLong}")

    // float serving grid; ef = inf rows are the resident IVF cell scan
    println(f"PROBE grid ${"mode"}%6s ${"nProbe"}%7s ${"ef"}%7s ${"recall@10"}%10s ${"qps"}%8s ${"ms/q"}%7s")
    def grid(mode: String, search: (Int, Int) => org.apache.spark.sql.DataFrame,
        probes: Seq[Int], efs: Seq[Int]): Unit =
      for (nProbe <- probes; ef <- efs) {
        def once(): Double = {
          val t0 = System.nanoTime()
          require(search(ef, nProbe).count() > 0)
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm plan + residency
        val sec = math.min(once(), once())
        val hits = search(ef, nProbe).select("query_id", "neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id")).count()
        val efLabel = if (ef == Int.MaxValue) "inf" else ef.toString
        println(f"PROBE grid $mode%6s $nProbe%7d $efLabel%7s ${hits / denom}%10.3f " +
          f"${nQ / sec}%8.0f ${sec * 1000 / nQ}%7.2f")
      }
    grid("float", (ef, np) => HnswIndex.search(spark, dirF, queries, k, ef, np),
      Seq(2, 4), Seq(64, 128, 256, 512))
    grid("pq_rr", (ef, np) => HnswIndex.searchPq(spark, dirP, queries, k, ef, np,
        window = 60, residentRerank = true),
      Seq(2), Seq(96, 256, 512))
    // r13 task #3a: the resident-rerank window/recall surface — where
    // does the exact-rerank window push recall past 0.9, and at what
    // per-query cost (B/vec residency is fixed; the window only widens
    // the in-cell rerank set)
    for (wnd <- Seq(90, 120, 180, 240))
      grid(s"pqw$wnd", (ef, np) => HnswIndex.searchPq(spark, dirP, queries, k, ef, np,
          window = wnd, residentRerank = true),
        Seq(2), Seq(256))
    grid("pq_io", (ef, np) => HnswIndex.searchPq(spark, dirP, queries, k, ef, np, window = 60),
      Seq(2), Seq(256))
    // scan rows: ef column is moot (every in-cell candidate is scored —
    // sims/q = nProbe·cellN by definition); recall = the probe ceiling
    grid("scan", (_, np) => graft.index.VectorIndex.search(spark, dirV, queries, k, np),
      Seq(2, 4), Seq(0))

    // sims touched per (query, searched cell) at 1e5-vector cells — the
    // counter extends the r12 table (781 → 12.5k → 1e5 cellN)
    val graphs = HnswIndex.loadGraph(spark, HnswIndex.Paths(dirF)).collect()
    val byId = graphs.flatMap(g => g.ids.map(_ -> g)).toMap
    val qRows = queries.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val avgCellN = graphs.map(_.n).sum.toDouble / graphs.length
    println(f"PROBE sims ${"ef"}%7s ${"cellN"}%8s ${"sims/q"}%8s ${"frac"}%8s")
    for (ef <- Seq(64, 128, 256, 512)) {
      val counter = new java.util.concurrent.atomic.LongAdder
      var n = 0
      qRows.foreach { case (qid, qv) =>
        byId.get(qid).foreach { g =>
          HnswIndex.searchCell(g, qv, ef, k, qid, counter); n += 1
        }
      }
      val simsPerQ = counter.sum().toDouble / n
      val efLabel = if (ef == Int.MaxValue) "inf" else ef.toString
      println(f"PROBE sims $efLabel%7s ${avgCellN}%8.0f ${simsPerQ}%8.0f ${simsPerQ / avgCellN}%8.4f")
    }
    println(f"PROBE sims ${"scan"}%7s ${avgCellN}%8.0f ${avgCellN}%8.0f ${1.0}%8.4f")
    Seq(dirF, dirI, dirP).foreach(HnswIndex.evict)

    // r13 task #3b: the production-cell recall ceiling above m=16 — the
    // reference's FAISS artifact runs M=32 (faiss_builder.py:50-53);
    // build + serving grid at m=24 and m=32 map where graph quality
    // stops binding recall at 10⁵-vector cells
    for (hm <- Seq(24, 32)) {
      val dirM = timedBuild(s"fl_m$hm") { d =>
        HnswIndex.build(emb, "vec_id", "embedding", nCells, d, m = hm,
          efConstruction = gEfc) }
      grid(s"fl_m$hm", (ef, np) => HnswIndex.search(spark, dirM, queries, k, ef, np),
        Seq(2), Seq(128, 256, 512))
      HnswIndex.evict(dirM)
    }
    spark.stop()
  }
}
