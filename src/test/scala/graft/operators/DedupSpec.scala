package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.{TextFunctions => TF}

/** Planted-defect dedup tests (reference pattern:
  * tests/fixtures/quality_test_data.py injects duplicates;
  * tests/test_quality_metrics.py:350-478 asserts they're found). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"
  private val nearDup = base.replace("quiet", "busy") // one-word edit
  private val unrelated =
    "completely different content about databases indexes and storage engines at scale"

  test("exact duplicate groups found after whitespace normalization") {
    val df = Seq((1L, "Hello  World"), (2L, " hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactDuplicateGroups(df, col("text")).collect()
    assert(groups.length == 1 && groups.head.getAs[Long]("n") == 2L)
  }

  test("minhash LSH finds the planted near-dup pair and not the unrelated one") {
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, "tiny"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", col("text"),
        shingleWords = 2, k = 12, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("jaccard is exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].head()
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("simhash: identical texts collide, near-dups are close, unrelated far") {
    val df = Seq((1L, base), (2L, base), (3L, nearDup), (4L, unrelated))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(TF.tokens(col("text"))).as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fp(1L) == fp(2L))
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)))
  }

  test("hamming column matches bit arithmetic") {
    val d = Seq((5L, 3L)).toDF("a", "b")
      .select(Dedup.hamming(col("a"), col("b"))).first().getInt(0)
    assert(d == java.lang.Long.bitCount(5L ^ 3L))
  }
}
