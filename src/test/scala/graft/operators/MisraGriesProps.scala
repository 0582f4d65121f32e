package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Misra–Gries sketch properties, pure JVM (no Spark session): random
  * corpora split across random partition layouts must satisfy the
  * published guarantees, which is what makes the distributed operator's
  * merge-by-sum correct at any scale:
  *   - never overcount;
  *   - per-merged-sketch undercount ≤ N/(capacity+1);
  *   - every token with true count > N/(capacity+1) survives;
  *   - capacity ≥ per-partition vocabulary ⇒ exact.
  */
object MisraGriesProps extends Properties("misra-gries") {

  // small alphabet + skew so heavy hitters actually exist
  private val tokenGen: Gen[String] =
    Gen.frequency(6 -> Gen.const("hh"), 3 -> Gen.oneOf("a", "b", "c"),
      2 -> Gen.choose(0, 30).map(i => s"t$i"))

  private val corpusGen: Gen[List[List[String]]] =
    Gen.listOfN(12, Gen.listOf(tokenGen)) // 12 "documents" of tokens

  private def mergedSketch(docs: List[List[String]], parts: Int,
      capacity: Int): Map[String, Long] = {
    val texts = docs.map(_.mkString(" "))
    texts.grouped(math.max(1, (texts.size + parts - 1) / parts))
      .flatMap(p => TextAnalysis.mgSketch(p.iterator, capacity))
      .toList.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
  }

  private def truth(docs: List[List[String]]): Map[String, Long] =
    docs.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  property("never overcounts; undercount within N/(c+1); heavy hitters survive") =
    forAll(corpusGen, Gen.chooseNum(1, 4), Gen.chooseNum(2, 8)) { (docs, parts, cap) =>
      val got = mergedSketch(docs, parts, cap)
      val want = truth(docs)
      val n = want.values.sum
      val bound = n / (cap + 1)
      val noOver = got.forall { case (t, c) => c <= want.getOrElse(t, 0L) }
      val inBound = want.forall { case (t, c) => c - got.getOrElse(t, 0L) <= bound }
      val heavySurvive = want.forall { case (t, c) => c <= bound || got.contains(t) }
      noOver && inBound && heavySurvive
    }

  property("capacity >= per-partition vocabulary makes the merged sketch exact") =
    forAll(corpusGen, Gen.chooseNum(1, 4)) { (docs, parts) =>
      mergedSketch(docs, parts, capacity = 64) == truth(docs)
    }
}
