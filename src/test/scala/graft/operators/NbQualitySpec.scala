package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Closed-form Naive Bayes quality classifier (X97). */
class NbQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("scores match the hand-computed closed form on a tiny corpus") {
    // pass docs say "good", fail docs say "bad"; one word each
    val docs = Seq(
      (1L, "good", true), (2L, "good", true),
      (3L, "bad", false)).toDF("doc_id", "text", "y")
    val out = TextAnalysis.nbQualityScores(docs, "doc_id", col("text"), col("y"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // vocab V=2; P(good|+)=(2+1)/(2+2)=3/4, P(good|-)=(0+1)/(1+2)=1/3
    // P(bad|+)=(0+1)/(2+2)=1/4,  P(bad|-)=(1+1)/(1+2)=2/3
    // prior = ln((2+1)/(1+1)) = ln 1.5
    val prior = math.round(math.log(1.5) * 1e6) / 1e6
    val wGood = math.round(math.log((3.0 / 4) / (1.0 / 3)) * 1e6) / 1e6
    val wBad = math.round(math.log((1.0 / 4) / (2.0 / 3)) * 1e6) / 1e6
    assert(math.abs(out(1L) - (prior + wGood)) < 1e-9)
    assert(math.abs(out(3L) - (prior + wBad)) < 1e-9)
  }

  test("generalizes the weak label to unlabeled-like content") {
    // train signal: docs full of "clean" words pass, "spam" words fail;
    // a mixed doc leaning clean must score positive, leaning spam negative
    val docs = Seq(
      (1L, "clean prose words here", true),
      (2L, "clean thoughtful words here", true),
      (3L, "spam spam buy now", false),
      (4L, "clean words spam here", true), // leans clean
      (5L, "spam buy spam words", false)) // leans spam
      .toDF("doc_id", "text", "y")
    val out = TextAnalysis.nbQualityScores(docs, "doc_id", col("text"), col("y"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("predicted_pass")).toMap
    assert(out(4L))
    assert(!out(5L))
  }

  test("empty-token docs score the bare prior and stay in the output") {
    val docs = Seq((1L, "w w w", true), (2L, "", false)).toDF("doc_id", "text", "y")
    val out = TextAnalysis.nbQualityScores(docs, "doc_id", col("text"), col("y"))
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("score"))).sortBy(_._1)
    assert(out.length == 2)
    assert(out(1)._2 == 0L)
    val prior = math.round(math.log((1 + 1.0) / (1 + 1)) * 1e6) / 1e6
    assert(math.abs(out(1)._3 - prior) < 1e-9)
  }
}
