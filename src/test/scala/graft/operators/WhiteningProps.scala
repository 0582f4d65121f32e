package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Whitening kernel properties, pure JVM (no Spark session): the moment
  * fold must be partition-layout-independent (that is what makes the
  * distributed fit == local fit at ANY partitioning, not just the one
  * the unit test happened to use), and the fitted transform must be the
  * affine map it claims to be. Vectors are integer-valued so double
  * summation is exact and layout-independence can be asserted exactly. */
object WhiteningProps extends Properties("whitening") {

  private val dimGen = Gen.choose(2, 5)

  private def vecGen(d: Int): Gen[Array[Double]] =
    Gen.listOfN(d, Gen.choose(-8, 8)).map(_.map(_.toDouble).toArray)

  private def corpusGen(d: Int): Gen[List[Array[Double]]] =
    Gen.choose(d + 2, 40).flatMap(n => Gen.listOfN(n, vecGen(d)))

  property("moment fold is split-point independent (exact on integer data)") =
    forAll(dimGen.flatMap(d => corpusGen(d).map(d -> _)),
        Gen.choose(0, 100)) { case ((d, xs), cutSeed) =>
      val whole = Whitening.moments(xs.iterator, d)
      val cut = cutSeed % (xs.size + 1)
      val (a, b) = xs.splitAt(cut)
      val split = Whitening.moments(a.iterator, d)
        .zip(Whitening.moments(b.iterator, d)).map { case (x, y) => x + y }
      whole.sameElements(split)
    }

  property("transform is the affine map W(x - mean): differences are linear") =
    forAll(dimGen.flatMap(d => corpusGen(d).map(d -> _))) { case (d, xs) =>
      val m = Whitening.modelFromMoments(
        Whitening.moments(xs.iterator, d), d, eps = 1e-3)
      val x = xs.head
      val y = xs.last
      val lhs = m.transform(x).zip(m.transform(y)).map { case (a, b) => a - b }
      // W(x-y) computed directly from the lower-triangular rows
      val diff = x.zip(y).map { case (a, b) => a - b }
      val rhs = Array.tabulate(d)(i =>
        (0 to i).map(j => m.w(i)(j) * diff(j)).sum)
      lhs.zip(rhs).forall { case (a, b) => math.abs(a - b) < 1e-9 }
    }

  property("whitening a rank-sufficient corpus never yields NaN/Inf") =
    forAll(dimGen.flatMap(d => corpusGen(d).map(d -> _))) { case (d, xs) =>
      val m = Whitening.modelFromMoments(
        Whitening.moments(xs.iterator, d), d, eps = 1e-3)
      xs.forall(x => m.transform(x).forall(v => !v.isNaN && !v.isInfinite))
    }
}
