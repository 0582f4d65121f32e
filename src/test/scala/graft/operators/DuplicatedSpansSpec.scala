package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Planted-repeat tests for X91 duplicated-substring span detection:
  * a shared phrase must surface as ONE maximal span per occurrence (the
  * overlapping duplicated k-gram windows merge), unique text must stay
  * unflagged, and the rolling gram chain must equal the naive per-window
  * fold it replaces. */
class DuplicatedSpansSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 8
  private val phrase = (1 to 10).map(i => s"p$i").mkString(" ") // 10 tokens

  private def spans(rows: Seq[(Long, String)]): Map[Long, Seq[(Int, Int, Int)]] =
    Dedup.duplicatedSpans(rows.toDF("doc_id", "text"), "doc_id", col("text"), K)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Int]("span_start"), r.getAs[Int]("span_end"), r.getAs[Int]("span_tokens"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap

  test("a phrase shared by two docs yields one maximal span per doc") {
    val a = phrase + " " + (1 to 5).map(i => s"ua$i").mkString(" ")   // phrase at 0
    val b = "vb1 vb2 vb3 " + phrase + " wb1 wb2 wb3 wb4"              // phrase at 3
    val out = spans(Seq((1L, a), (2L, b), (3L, "xc1 xc2 xc3 xc4 xc5 xc6 xc7 xc8 xc9")))
    // doc 1: dup 8-gram windows start at 0,1,2 -> one island covering [0, 9]
    assert(out(1L) == Seq((0, 9, 10)), s"doc 1 spans: ${out.get(1L)}")
    // doc 2: same phrase shifted to 3 -> [3, 12]
    assert(out(2L) == Seq((3, 12, 10)), s"doc 2 spans: ${out.get(2L)}")
    // doc 3: unique 9 tokens (>= k windows exist) but no duplication
    assert(!out.contains(3L), s"unique doc flagged: ${out.get(3L)}")
  }

  test("an internal repeat in a single doc yields two islands past the gap") {
    // phrase at 0 (10 tokens), 9 unique tokens, phrase again at 19:
    // duplicated window starts {0,1,2} and {19,20,21}, gap 17 > k
    val c = phrase + " " + (1 to 9).map(i => s"g$i").mkString(" ") + " " + phrase
    val out = spans(Seq((1L, c)))
    assert(out(1L) == Seq((0, 9, 10), (19, 28, 10)), s"doc spans: ${out.get(1L)}")
  }

  test("docs shorter than k tokens never produce spans or windows") {
    val out = spans(Seq((1L, "a b c"), (2L, "a b c")))
    assert(out.isEmpty)
  }

  test("contaminated spans flag exactly the eval phrase region") {
    import org.apache.spark.sql.functions.col
    val eval = Seq((100L, "e1 e2 " + phrase + " e3")).toDF("doc_id", "text")
    // train doc 1 embeds the eval phrase at position 2; doc 2 is clean;
    // doc 3 repeats ITSELF but shares nothing with eval (must NOT flag —
    // contamination is vs eval only, not self-duplication)
    val selfDup = (1 to 8).map(i => s"s$i").mkString(" ")
    val train = Seq(
      (1L, "t1 t2 " + phrase + " t3 t4"),
      (2L, (1 to 15).map(i => s"c$i").mkString(" ")),
      (3L, selfDup + " mid " + selfDup)).toDF("doc_id", "text")
    val out = Dedup.contaminatedSpans(train, eval, "doc_id", col("text"), K)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Int]("span_start"), r.getAs[Int]("span_end"), r.getAs[Int]("span_tokens"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap
    assert(out(1L) == Seq((2, 11, 10)), s"doc 1: ${out.get(1L)}")
    assert(!out.contains(2L) && !out.contains(3L),
      s"clean/self-dup docs flagged: $out")
  }

  test("two-phase and windowed formulations agree on a hot-gram corpus") {
    // the SpanProbe matrix measured TIME on the 5%x30 hot-mass shape;
    // this pins that the default two-phase dup-gram-set formulation and
    // the retired window-count one also AGREE there: a boilerplate
    // phrase planted in 5% of docs and repeated 30x inside each, plus
    // unique docs, plus a doc with an internal self-repeat
    val hot = (1 to K).map(i => s"h$i").mkString(" ")
    val rnd = new scala.util.Random(11)
    def uniq(doc: Int, n: Int) = (1 to n).map(_ => s"u${doc}_${rnd.nextInt(1000000)}").mkString(" ")
    val docs = (1 to 100).map { d =>
      if (d <= 5) // hot docs: 30 copies of the phrase with unique filler between
        (d.toLong, (1 to 30).map(_ => hot).mkString(" ") + " " + uniq(d, 10))
      else if (d == 6) (d.toLong, uniq(d, 12) + " " + uniq(d, 0)) // unique
      else (d.toLong, uniq(d, 15))
    }
    val df = docs.toDF("doc_id", "text")
    def collect(out: org.apache.spark.sql.DataFrame) = out.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Int]("span_tokens"))).toSet
    val twoPhase = collect(Dedup.duplicatedSpans(df, "doc_id", col("text"), K))
    val windowed = collect(Dedup.duplicatedSpansWindowed(df, "doc_id", col("text"), K))
    assert(twoPhase == windowed,
      s"formulations diverge on hot mass:\nonly2p=${twoPhase -- windowed}\nonlyW=${windowed -- twoPhase}")
    assert(twoPhase.exists(_._1 <= 5L), "hot docs must carry flagged spans")
    assert(!twoPhase.exists(t => t._1 > 5L), "unique docs flagged")
  }

  test("rolling gram chain equals the naive per-window fold") {
    val rnd = new scala.util.Random(7)
    val hs = Array.fill(50)(math.abs(rnd.nextLong()) % graft.functions.Hashes.PolyMod)
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(hs)
    for (k <- Seq(2, 3, 8, 50)) {
      val rolled = graft.expressions.HashKernels
        .gramChain(arr, k, graft.functions.Hashes.SpanGramMul).toLongArray()
      val naive = (0 to hs.length - k).map { i =>
        hs.slice(i, i + k).foldLeft(0L)((acc, h) =>
          (acc * graft.functions.Hashes.SpanGramMul + h) % graft.functions.Hashes.PolyMod)
      }.toArray
      assert(rolled.sameElements(naive), s"k=$k mismatch")
    }
    assert(graft.expressions.HashKernels
      .gramChain(arr, 51, graft.functions.Hashes.SpanGramMul).numElements() == 0)
  }
}
