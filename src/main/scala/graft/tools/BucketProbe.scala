package graft.tools

import org.apache.spark.sql.functions._

/** Scratch diagnostic: LSH bucket-size distribution for q19's banding
  * (k=12, 3 bands) at a given sf dir, plus the candidate-pair mass that
  * survives a per-bucket cap at several B values — the evidence for
  * choosing [[graft.operators.Dedup]]'s default band-bucket cap. Not a
  * library surface.
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.create()
    import graft.functions.{TextFunctions => TF}
    graft.expressions.HashFunctions.register(spark)
    graft.expressions.TextExprs.register(spark)
    val (k, bands) = (12, 3)
    val docs = graft.Tables.documentsSpread(spark, dir).select(col("doc_id"), col("text"))
    val sig = docs.select(col("doc_id"), TF.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        graft.expressions.TextExprs.distinct_word_ngrams(col("tk"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("hs", graft.expressions.HashFunctions.poly_hash_array(col("sh")))
      .withColumn("sig", graft.operators.Dedup.signatureFromHashes(col("hs"), k))
    val b = graft.operators.Dedup.minhashBands(sig, "doc_id", "sig", bands, k / bands)
    val sizes = b.groupBy("band_id", "band_key").agg(count(lit(1)).as("n"))
      .select("n").as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    val nB = sizes.length
    def q(p: Double) = sizes(math.min(nB - 1, (p * nB).toInt))
    val mass = sizes.map(n => n * (n - 1) / 2).sum
    println(f"PROBE dir=$dir buckets=$nB p50=${q(0.5)} p90=${q(0.9)} p99=${q(0.99)} max=${sizes.last} candPairMass=$mass")
    for (cap <- Seq(8, 16, 32, 64)) {
      val flagged = sizes.count(_ > cap)
      val dropped = sizes.filter(_ > cap).map(n => n * (n - 1) / 2).sum
      val rowsIn = sizes.filter(_ > cap).sum
      println(f"PROBE cap=$cap%3d fluggedBuckets=$flagged rowsInFlagged=$rowsIn pairMassKept=${mass - dropped} (${100.0 * (mass - dropped) / math.max(1, mass)}%.1f%%)")
    }
    spark.stop()
  }
}
