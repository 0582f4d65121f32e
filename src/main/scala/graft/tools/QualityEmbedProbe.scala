package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: split the quality-assess "embedding" category's wall into
  * its internal steps on the bench's synthetic 81k-span corpus —
  * (1) embed + segments⋈embeddings join + cache build, (2) the sampled
  * exact k-NN, (3) the metadata join-back + eager checkpoint, (4) the
  * three metric aggregations. Usage: QualityEmbedProbe [nSpans] [reps]. */
object QualityEmbedProbe {
  def main(args: Array[String]): Unit = {
    val nSpans = if (args.length > 0) args(0).toLong else 81115L
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.quality.EmbeddingSanity
    val t = graft.quality.Quality.Thresholds()

    val spans = spark.range(nSpans).select(
      format_string("spn_%08d", col("id")).as("span_id"),
      format_string("EP%d", col("id") % 5).as("episode_id"),
      format_string("Speaker %d", col("id") % 40).as("speaker"),
      (floor(col("id") / 5) * 30.0).as("start_time"),
      (floor(col("id") / 5) * 30.0 + 20.0 + (col("id") % 21)).as("end_time"),
      (lit(20.0) + (col("id") % 21)).as("duration"),
      concat(
        lit("w"), col("id") % 997, lit(" w"), (col("id") * 7) % 991,
        lit(" w"), (col("id") * 13) % 983, lit(" w"), (col("id") * 29) % 977,
        lit(" w"), (col("id") * 31) % 1009, lit(" w"), (col("id") * 37) % 1013,
        lit(" seg "), col("id"), lit(" spoken words")).as("text"))
      .localCheckpoint(false)
    spans.count()
    val emb = graft.embed.Embedder.embed(
      spans, "span_id", "text", "span", graft.embed.HashEncoder(dim = 16))

    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (rep <- 1 to reps) {
      println(s"--- rep $rep")
      val whole = timed("whole sampledNeighbors") {
        EmbeddingSanity.sampledNeighbors(spans, emb, "span_id",
          t.neighborK, t.neighborSampleSize)
      }
      timed("metric aggs") {
        EmbeddingSanity.leakagePcts(whole).first()
        EmbeddingSanity.adjacencyBiasPct(whole, t.adjacencyToleranceSeconds).first()
        EmbeddingSanity.lengthBiasCorr(whole).first()
      }
      // internal split (mirrors sampledNeighbors)
      import graft.functions.{VectorFunctions => VF}
      import graft.expressions.VectorExprs
      VectorExprs.register(spark)
      val base = timed("join+cache build") {
        val b = spans.join(
            emb.select(col("artifact_id").as("span_id"), col("embedding")), "span_id")
          .withColumn("v", VF.vecAsDouble(col("embedding")))
          .withColumn("nrm", sqrt(VectorExprs.vec_dot(col("v"), col("v"))))
          .cache()
        b.count()
        b
      }
      val metaCols = Seq("episode_id", "speaker", "start_time", "end_time")
      val queries = base.orderBy(xxhash64(col("span_id")), col("span_id"))
        .limit(t.neighborSampleSize)
        .select((col("span_id").as("query_id") +: col("v").as("qv") +:
          metaCols.map(c => col(c).as(s"q_$c"))): _*)
      val corpus = base
        .select((col("span_id").as("neighbor_id") +: col("v").as("nv") +:
          metaCols.map(c => col(c).as(s"n_$c"))): _*)
      val knn = timed("topKExact (noop-consumed)") {
        val k = graft.operators.Similarity.topKExact(
          queries.select("query_id", "qv"), corpus.select("neighbor_id", "nv"),
          t.neighborK)
        k.write.format("noop").mode("overwrite").save()
        k
      }
      timed("join-back + checkpoint") {
        knn.join(queries.drop("qv"), "query_id")
          .join(corpus.drop("nv"), "neighbor_id")
          .localCheckpoint(true)
      }
      base.unpersist()
    }
    spark.stop()
  }
}
