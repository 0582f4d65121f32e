package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Count-Min properties, pure JVM: the deterministic guarantees that
  * make the distributed build correct — never undercounts, merge of
  * partition sketches equals the whole-corpus sketch (so partitioning
  * cannot change the answer), and fixed-seed determinism.
  */
object CountMinProps extends Properties("count-min") {

  private val keyGen: Gen[String] =
    Gen.frequency(5 -> Gen.const("hot"), 3 -> Gen.oneOf("a", "b", "c"),
      2 -> Gen.choose(0, 40).map(i => s"k$i"))

  private val corpusGen: Gen[List[String]] = Gen.listOf(keyGen)

  private def sketchOf(keys: Seq[String], w: Int = 256, d: Int = 4) =
    keys.foldLeft(CountMin.empty(w, d))((s, k) => s.add(k))

  property("estimate never undercounts any key") =
    forAll(corpusGen) { keys =>
      val s = sketchOf(keys)
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      truth.forall { case (k, c) => s.estimate(k) >= c }
    }

  property("merging per-partition sketches equals the whole-corpus sketch") =
    forAll(corpusGen, Gen.chooseNum(1, 5)) { (keys, parts) =>
      val whole = sketchOf(keys)
      val step = math.max(1, (keys.size + parts - 1) / parts)
      val merged = keys.grouped(step).map(p => sketchOf(p))
        .foldLeft(CountMin.empty(256, 4))(_.merge(_))
      merged.counts.sameElements(whole.counts) && merged.n == whole.n
    }

  property("same corpus, same sketch (fixed seeds, order-free totals)") =
    forAll(corpusGen) { keys =>
      val a = sketchOf(keys)
      val b = sketchOf(keys)
      a.counts.sameElements(b.counts) && a.n == b.n
    }

  property("overcount stays within the colliding mass bound for a roomy sketch") =
    forAll(corpusGen) { keys =>
      // with ≤ ~45 distinct keys in a 256-wide row, expected colliding
      // mass per row is small; min over 4 rows must stay within N/4 —
      // a deliberately loose deterministic ceiling far above e/width·N
      val s = sketchOf(keys)
      val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val n = keys.size.toLong
      truth.forall { case (k, c) => s.estimate(k) - c <= math.max(2L, n / 4) }
    }

  property("geometry mismatch on merge is refused") =
    forAll(Gen.const(())) { _ =>
      try { CountMin.empty(128, 4).merge(CountMin.empty(256, 4)); false }
      catch { case e: IllegalArgumentException => e.getMessage.contains("geometry") }
    }
}
