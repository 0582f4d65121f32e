package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** X108 incremental near-dup: a delta batch deduped against a persisted
  * index must reproduce exactly the full-corpus run's pairs that touch
  * the delta — never a base×base pair, and the bucket cap must see the
  * COMBINED bucket population. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"
  private val nearDup = base.replace("quiet", "busy")
  private val unrelated =
    "completely different content about databases indexes and storage engines at scale"

  private def runIncremental(docs: Seq[(Long, String)], isDelta: Long => Boolean,
      cap: Int = Int.MaxValue): Set[(Long, Long, Double)] = {
    val df = docs.toDF("doc_id", "text")
    val idx = Dedup.nearDupIndex(df.filter(!col("doc_id").isin(
        docs.map(_._1).filter(isDelta): _*)),
      "doc_id", col("text"), shingleWords = 2, k = 12)
    Dedup.incrementalNearDups(idx,
        df.filter(col("doc_id").isin(docs.map(_._1).filter(isDelta): _*)),
        "doc_id", col("text"), shingleWords = 2, k = 12, bands = 4,
        threshold = 0.5, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  test("new-old and new-new pairs found; old-old pairs never emitted") {
    // base: 1,2 are twins (old-old: must NOT appear); delta: 10 is a
    // near-dup of base doc 1 (new-old), 11/12 are twins (new-new)
    val docs = Seq((1L, base), (2L, base), (3L, unrelated),
      (10L, nearDup), (11L, unrelated + " extra"), (12L, unrelated + " extra"))
    val out = runIncremental(docs, _ >= 10L)
    assert(!out.contains((1L, 2L, 1.0)), s"old-old pair leaked: $out")
    assert(out.exists(t => t._1 == 1L && t._2 == 10L), s"new-old pair missing: $out")
    assert(out.contains((11L, 12L, 1.0)), s"new-new pair missing: $out")
  }

  test("incremental equals the full run restricted to delta-touching pairs (randomized)") {
    val rnd = new Random(42)
    val vocab = (1 to 30).map(i => s"w$i")
    // clustered corpus: 12 templates, each with several mutated copies,
    // so near-dup pairs land inside AND across the base/delta split
    val docs = (0 until 12).flatMap { t =>
      val tmpl = Seq.fill(14)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (0 until (2 + rnd.nextInt(4))).map { c =>
        val words = tmpl.split(" ")
        val i = rnd.nextInt(words.length)
        val mutated = words.updated(i, vocab(rnd.nextInt(vocab.size))).mkString(" ")
        ((t * 10 + c).toLong, if (c == 0) tmpl else mutated)
      }
    }
    def isDelta(id: Long) = id % 3 == 0
    for (cap <- Seq(Int.MaxValue, 4)) {
      val full = Dedup.minhashNearDups(docs.toDF("doc_id", "text"), "doc_id",
          col("text"), shingleWords = 2, k = 12, bands = 4, threshold = 0.5,
          maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val expected = full.filter(t => isDelta(t._1) || isDelta(t._2))
      val inc = runIncremental(docs, isDelta, cap)
      assert(inc == expected,
        s"cap=$cap diverged:\nonly-full=${expected -- inc}\nonly-inc=${inc -- expected}")
      if (cap == Int.MaxValue)
        assert(expected.nonEmpty, "degenerate test: no delta-touching pairs")
    }
  }

  test("bucket cap counts the COMBINED population: a bucket the delta pushes over the cap is skipped") {
    // 20 base copies (bucket size 20 <= 32 alone) + 15 delta copies ->
    // combined 35 > 32: every band bucket for the family is skipped, so
    // NO pair survives — exactly the full capped run's answer. The
    // honest twin pair (1,2)-old (3)-new stays under cap and survives.
    val family = (100L until 120L).map(i => (i, base)) ++
      (200L until 215L).map(i => (i, base))
    val docs = family ++ Seq((1L, unrelated), (2L, unrelated), (7L, unrelated))
    val out = runIncremental(docs, id => id >= 200L || id == 7L, cap = 32)
    assert(!out.exists(t => t._1 >= 100L || t._2 >= 100L),
      s"capped family scored through the incremental path: $out")
    assert(out == Set((1L, 7L, 1.0), (2L, 7L, 1.0)),
      s"under-cap delta-touching pairs must survive (old-old 1-2 excluded): $out")
  }
}
