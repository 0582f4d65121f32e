package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only: split q113 (collapsed jaccard top-pairs) into its map side
  * (shingle+hash encoding) and the grouped/kernel remainder, and A/B the
  * r15 distinct_word_ngrams kernel against the r14 HOF chain on this
  * exact path. Usage: JaccardPathProbe <sfDir> [reps]. */
object JaccardPathProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.expressions.{TextExprs => TE}
    import graft.functions.{TextFunctions => TF}
    import graft.operators.Dedup
    TE.register(spark)
    val base = graft.Tables.documentsSpread(spark, dir)
      .select(col("lang"), col("doc_id"), TF.tokens(col("text")).as("tk"))
    def kernelDocs = base.select(col("lang"), col("doc_id"),
      TE.xx_sorted_hash(TE.distinct_word_ngrams(col("tk"), 2)).as("hsh"))
    // r14 form: transform+slice+concat_ws HOF shingles, then distinct
    def hofDocs = base.select(col("lang"), col("doc_id"),
      TE.xx_sorted_hash(array_distinct(
        when(size(col("tk")) >= 2,
          transform(sequence(lit(0), size(col("tk")) - 2),
            i => concat_ws(" ", get(col("tk"), i), get(col("tk"), i + 1))))
          .otherwise(array()))).as("hsh"))
    for (rep <- 1 to reps) {
      var t0 = System.nanoTime()
      kernelDocs.write.format("noop").mode("overwrite").save()
      println(f"[probe] rep$rep map kernel: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      hofDocs.write.format("noop").mode("overwrite").save()
      println(f"[probe] rep$rep map hof:    ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      Dedup.jaccardTopPairsCollapsed(kernelDocs, "lang", "doc_id", "hsh",
        k = 20, nBlocks = 8).count()
      println(f"[probe] rep$rep full kernel: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      Dedup.jaccardTopPairsCollapsed(hofDocs, "lang", "doc_id", "hsh",
        k = 20, nBlocks = 8).count()
      println(f"[probe] rep$rep full hof:    ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
