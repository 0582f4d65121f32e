package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** BPE training/encoding checks on the classic Sennrich-style corpus:
  * learned merges match the hand-computed sequence, encoding respects
  * merge order, and the distributed front-end equals pure-JVM training
  * on the same frequency table. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // the classic BPE illustration vocabulary (public, Sennrich et al. 2016)
  private val counts = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("training learns the classic merge sequence deterministically") {
    val m = Bpe.trainFromCounts(counts, nMerges = 4)
    // pair counts round 1: (e,s)=9 wins (newest 6 + widest 3)
    assert(m.merges.head == (("e", "s")), s"merges: ${m.merges}")
    // round 2: (es,t)=9 wins; round 3: (t,' ')=9 after est formed
    assert(m.merges(1) == (("es", "t")), s"merges: ${m.merges}")
    assert(Bpe.trainFromCounts(counts, 4).merges == m.merges,
      "same table must always yield the same merges")
  }

  test("encoding applies merges greedily and strips the sentinel") {
    val m = Bpe.trainFromCounts(counts, nMerges = 10)
    val est = m.encodeWord("newest")
    assert(est.mkString("|").contains("est") || est == Seq("newest"),
      s"'newest' should contain the est unit or be fully merged: $est")
    // an unseen word with no merge coverage falls back to characters
    val zz = Bpe.trainFromCounts(counts, 1) // only (e,s) learned
    assert(zz.encodeWord("xyz") == Seq("x", "y", "z"))
    assert(zz.encodeWord("") == Seq.empty)
  }

  test("distributed train equals pure-JVM train; stats count subwords") {
    import spark.implicits._
    // rebuild the frequency table as an actual corpus
    val docs = counts.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text").repartition(5)
    val dist = Bpe.train(docs, col("text"), nMerges = 4)
    val jvm = Bpe.trainFromCounts(counts, nMerges = 4)
    assert(dist.merges == jvm.merges,
      s"distributed ${dist.merges} vs jvm ${jvm.merges}")
    val stats = Bpe.subwordStats(docs, "doc_id", col("text"), dist).collect()
    assert(stats.length == 16)
    stats.foreach { r =>
      assert(r.getAs[Long]("n_words") == 1L)
      assert(r.getAs[Long]("n_subwords") >= 1L)
    }
  }
}
