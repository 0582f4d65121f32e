package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.core.CanonicalJson._
import graft.snapshot.Snapshot

/** Property tests for the deterministic driver-side kernels: canonical
  * JSON rendering, Python-parity rounding/repr, ID generation, semver.
  * These invariants back the golden-ID contract — a counterexample here
  * means a silent cross-run ID divergence. */
object CoreProps extends Properties("core") {

  private val keyGen = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
  private val strGen: Gen[String] = Gen.asciiPrintableStr.map(_.take(40))
  private val finiteGen: Gen[Double] =
    Gen.chooseNum(-1e15, 1e15).suchThat(d => !d.isNaN && !d.isInfinite)

  private val jLeaf: Gen[JValue] = Gen.oneOf(
    strGen.map(JStr),
    finiteGen.map(JFloat),
    Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2).map(JInt))

  private val jObjGen: Gen[JObj] = for {
    n <- Gen.chooseNum(0, 6)
    keys <- Gen.listOfN(n, keyGen)
    vals <- Gen.listOfN(n, jLeaf)
  } yield JObj(keys.distinct.zip(vals))

  property("object rendering is insertion-order invariant") =
    forAll(jObjGen) { o =>
      render(o) == render(JObj(o.v.reverse)) &&
        render(o) == render(JObj(scala.util.Random.shuffle(o.v.toList)))
    }

  property("rendered keys appear sorted") = forAll(jObjGen) { o =>
    val keys = o.v.map(_._1).sorted
    val r = render(o)
    // each sorted key's quoted form appears at a non-decreasing offset
    val offsets = keys.map(k => r.indexOf("\"" + escape(k) + "\":"))
    offsets == offsets.sorted && offsets.forall(_ >= 0)
  }

  property("pyRound is idempotent at the same scale") =
    forAll(finiteGen) { x =>
      val once = pyRound(x, 2)
      pyRound(once, 2) == once
    }

  property("pyRound(_, 2) lands within half a cent") =
    forAll(Gen.chooseNum(-1e9, 1e9)) { x =>
      math.abs(pyRound(x, 2) - x) <= 0.005 + 1e-9
    }

  property("pyFloatRepr parses back to the identical double") =
    forAll(finiteGen) { x =>
      pyFloatRepr(x).toDouble == x
    }

  property("escape emits no raw control characters") =
    forAll(Gen.listOf(Gen.chooseNum(0, 127).map(_.toChar)).map(_.mkString)) { s =>
      escape(s).forall(c => c >= ' ')
    }

  private val idArgs = for {
    ep <- Gen.alphaNumStr.map("EP-" + _.take(10))
    pos <- Gen.chooseNum(0, 999999)
    text <- strGen
    spk <- keyGen
    s <- Gen.chooseNum(0.0, 10000.0)
    e <- Gen.chooseNum(0.0, 10000.0)
  } yield (ep, pos, text, spk, s, e)

  property("utteranceId is deterministic and format-valid") =
    forAll(idArgs) { case (ep, pos, text, spk, s, e) =>
      val id = Ids.utteranceId(ep, pos, text, spk, s, e)
      id == Ids.utteranceId(ep, pos, text, spk, s, e) &&
        Ids.isValidFormat(id, "utterance")
    }

  property("utteranceId separates positions") =
    forAll(idArgs) { case (ep, pos, text, spk, s, e) =>
      val other = (pos + 1) % 1000000
      Prop.iff[Boolean](pos != other, { case _ =>
        Ids.utteranceId(ep, pos, text, spk, s, e) !=
          Ids.utteranceId(ep, other, text, spk, s, e)
      })
    }

  property("spanId ignores utterance-id order") =
    forAll(idArgs, Gen.listOfN(4, keyGen)) { case ((ep, pos, text, spk, _, _), ids) =>
      Ids.spanId(ep, pos, spk, ids, text) ==
        Ids.spanId(ep, pos, spk, ids.reverse, text)
    }

  private val semverGen = for {
    ma <- Gen.chooseNum(0, 99); mi <- Gen.chooseNum(0, 99); pa <- Gen.chooseNum(0, 99)
  } yield s"v$ma.$mi.$pa"

  property("semver bump parses back and advances the right part") =
    forAll(semverGen, Gen.oneOf("major", "minor", "patch")) { (v, part) =>
      val Some((ma, mi, pa)) = Snapshot.parseSemver(v)
      Snapshot.parseSemver(Snapshot.bumpSemver(v, part)).contains(part match {
        case "major" => (ma + 1, 0, 0)
        case "minor" => (ma, mi + 1, 0)
        case _       => (ma, mi, pa + 1)
      })
    }
}
