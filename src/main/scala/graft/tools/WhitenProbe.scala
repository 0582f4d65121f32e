package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic: X102 whitening kernel throughput at a size where
  * per-job overhead stops dominating — fit (one moment pass) and
  * transform (codegen'd packed-triangular map) over n hash-random
  * d=64 vectors, warm second run reported alongside the cold one.
  * Usage: runMain graft.tools.WhitenProbe [nRows=1000000]
  */
object WhitenProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val dim = 64
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val emb = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (pmod(xxhash64(col("id") * dim + i), lit(1000)).cast("double") / 500.0 - 1.0
            + pmod(xxhash64(i), lit(7)).cast("double") * 0.3).cast("float"))
          .as("embedding"))
        .localCheckpoint(false) // measure the kernel, not the generator
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val model = graft.operators.Whitening.fit(emb, col("embedding"))
        val fitSec = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val s = graft.operators.Whitening
          .transform(emb, col("embedding"), model, "_w")
          .agg(sum(element_at(col("_w"), 1))).collect()(0).getDouble(0)
        val trSec = (System.nanoTime() - t1) / 1e9
        println(f"PROBE run$run n=$n d=$dim fit=$fitSec%.2f s (${(n / fitSec).toLong} rows/s) " +
          f"transform=$trSec%.2f s (${(n / trSec).toLong} rows/s) [checksum $s%.3f]")
      }
    } finally spark.stop()
  }
}
