package graft.segment

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.core.SpanForBeats

/** Property tests for the beat-boundary kernel: whatever the spans look
  * like, the boundary list must be a valid segmentation (the reference's
  * imperative loop guarantees this implicitly; we pin it explicitly). */
object BeatsProps extends Properties("beats") {

  private def span(i: Int, speaker: String, start: Double, dur: Double,
      emb: Option[Seq[Float]]): SpanForBeats =
    SpanForBeats(s"spn_$i", "ep", speaker, is_expert = false,
      start, start + dur, dur, s"text $i", emb)

  private val spansGen: Gen[IndexedSeq[SpanForBeats]] = for {
    n <- Gen.chooseNum(1, 40)
    speakers <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    durs <- Gen.listOfN(n, Gen.chooseNum(0.5, 200.0))
    gaps <- Gen.listOfN(n, Gen.chooseNum(0.0, 10.0))
  } yield {
    var t = 0.0
    (0 until n).map { i =>
      val s = t + gaps(i)
      t = s + durs(i)
      span(i, speakers(i), s, durs(i), None)
    }
  }

  private val embSpansGen: Gen[IndexedSeq[SpanForBeats]] = for {
    base <- spansGen
    vecs <- Gen.listOfN(base.length, Gen.listOfN(4, Gen.chooseNum(-1f, 1f)))
  } yield base.zip(vecs).map { case (s, v) => s.copy(embedding = Some(v)) }

  private val cfg = Beats.Config()

  private def validSegmentation(spans: IndexedSeq[SpanForBeats],
      b: IndexedSeq[Int]): Boolean =
    b.nonEmpty && b.head == 0 &&
      b.forall(i => i >= 0 && i < spans.length) &&
      b.sliding(2).forall(p => p.length < 2 || p(0) < p(1))

  property("heuristic boundaries form a valid segmentation") =
    forAll(spansGen) { spans =>
      validSegmentation(spans, Beats.boundaries(spans, cfg))
    }

  property("semantic boundaries form a valid segmentation") =
    forAll(embSpansGen) { spans =>
      validSegmentation(spans, Beats.boundaries(spans, cfg))
    }

  property("heuristic mode: every speaker change is a boundary") =
    forAll(spansGen) { spans =>
      val b = Beats.boundaries(spans, cfg).toSet
      (1 until spans.length).forall { i =>
        spans(i).speaker == spans(i - 1).speaker || b.contains(i)
      }
    }

  property("single-speaker contiguous spans under the duration cap are one beat") =
    forAll(Gen.chooseNum(1, 10)) { n =>
      val spans = (0 until n).map(i => span(i, "solo", i * 10.0, 9.0, None))
      Beats.boundaries(spans, cfg) == IndexedSeq(0)
    }

  property("identical embeddings never split semantically") =
    forAll(Gen.chooseNum(1, 10)) { n =>
      val v = Some(Seq(0.5f, 0.5f, 0.1f, 0.2f))
      val spans = (0 until n).map(i => span(i, "s", i * 10.0, 9.0, v))
      Beats.boundaries(spans, cfg) == IndexedSeq(0)
    }
}
