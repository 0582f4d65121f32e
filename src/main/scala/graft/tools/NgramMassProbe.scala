package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scratch diagnostic: A/B the hash+join-back topNgramMass against a
  * single-pass struct-min argmax on real data. Not a library surface.
  */
object NgramMassProbe {
  def singlePass(df: DataFrame, idCol: String, textCol: Column, n: Int): DataFrame = {
    import graft.functions.{TextFunctions => TF}
    val grams = df
      .select(col(idCol), TF.tokens(textCol).as("_tk"))
      .filter(size(col("_tk")) >= n)
      .select(col(idCol), explode(
        transform(sequence(lit(0), size(col("_tk")) - n),
          i => concat_ws(" ", slice(col("_tk"), i + 1, lit(n))))).as("gram"))
    val counts = grams.groupBy(col(idCol), col("gram")).agg(count(lit(1)).as("cnt"))
    counts.groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_grams"),
        min(struct((-col("cnt")).as("nc"), col("gram").as("g"))).as("_w"))
      .select(col(idCol), col("n_grams"), col("_w.g").as("top_gram"),
        (-col("_w.nc")).as("top_n"),
        ((-col("_w.nc")).cast("double") / col("n_grams")).as("top_fraction"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = graft.GraftSession.create()
    val docs = graft.Tables.documentsSpread(spark, dir)
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r rows)")
    }
    time("current    ")(graft.operators.TextAnalysis.topNgramMass(docs, "doc_id", col("text"), 2).count())
    time("single-pass")(singlePass(docs, "doc_id", col("text"), 2).count())
    // results must be identical
    val a = graft.operators.TextAnalysis.topNgramMass(docs, "doc_id", col("text"), 2)
      .selectExpr("doc_id", "n_grams", "top_gram", "top_n", "round(top_fraction, 9) f")
    val b = singlePass(docs, "doc_id", col("text"), 2)
      .selectExpr("doc_id", "n_grams", "top_gram", "top_n", "round(top_fraction, 9) f")
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"PROBE diff-rows: $diff")
    spark.stop()
  }
}
