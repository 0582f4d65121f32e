package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** HyperLogLog properties, pure JVM: the guarantees that make the
  * mergeable-artifact design correct — duplicates never move a register,
  * merge of partition sketches equals the whole-corpus sketch (so
  * partitioning cannot change the answer), merge is the set union, and
  * the estimate tracks true cardinality within the published error bound.
  */
object HyperLogLogProps extends Properties("hyperloglog") {

  private val keyGen: Gen[String] = Gen.choose(0, 5000).map(i => s"key$i")
  private val corpusGen: Gen[List[String]] = Gen.listOf(keyGen)

  private def sketchOf(keys: Seq[String], p: Int = 10) =
    keys.foldLeft(HyperLogLog.empty(p))((s, k) => s.add(k))

  property("duplicates never change the sketch") =
    forAll(corpusGen) { keys =>
      val once = sketchOf(keys.distinct)
      val thrice = sketchOf(keys ++ keys ++ keys)
      keys.isEmpty || once.regs.sameElements(sketchOf(keys).regs) &&
        thrice.regs.sameElements(sketchOf(keys).regs)
    }

  property("merging per-partition sketches equals the whole-corpus sketch") =
    forAll(corpusGen, Gen.chooseNum(1, 5)) { (keys, parts) =>
      val whole = sketchOf(keys)
      val step = math.max(1, (keys.size + parts - 1) / parts)
      val merged = keys.grouped(step).map(p => sketchOf(p))
        .foldLeft(HyperLogLog.empty(10))(_.merge(_))
      merged.regs.sameElements(whole.regs)
    }

  property("merge estimates the union, not the sum") =
    forAll(Gen.chooseNum(500, 2000)) { n =>
      // identical halves: union cardinality is n, a sum would read 2n
      val keys = (0 until n).map(i => s"u$i")
      val est = sketchOf(keys, p = 12).merge(sketchOf(keys, p = 12)).estimate
      math.abs(est - n) / n < 0.10
    }

  property("estimate within 6 sigma of true cardinality (sigma = 1.04/sqrt(m))") =
    forAll(Gen.chooseNum(10, 20000)) { n =>
      val p = 12
      val sigma = 1.04 / math.sqrt((1 << p).toDouble)
      val est = sketchOf((0 until n).map(i => s"card$i"), p).estimate
      math.abs(est - n) / n < 6 * sigma + 0.01 // +1% slack for tiny n
    }
}
