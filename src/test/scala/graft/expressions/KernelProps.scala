package graft.expressions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the codegen kernels against naive reference
  * implementations — pure JVM, no Spark session, so hundreds of cases
  * cost milliseconds. A counterexample here is a silent wrong answer in
  * every query the kernel backs. */
object KernelProps extends Properties("kernels") {

  private val strGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('é')))
      .map(_.mkString.take(60))

  property("distinctCharNgrams matches the naive code-point windowing") =
    forAll(strGen, Gen.chooseNum(1, 5)) { (s, n) =>
      val got = TextKernels.distinctCharNgrams(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val cps = s.codePoints().toArray
      val want = (0 to cps.length - n)
        .map(i => new String(cps, i, n)).distinct
      got == want
    }

  property("regexCount equals the matcher loop for arbitrary safe patterns") =
    forAll(strGen, Gen.oneOf("[a-z]+", "[0-9]", "x*", "\\s")) { (s, p) =>
      val pat = java.util.regex.Pattern.compile(p)
      val m = pat.matcher(s)
      var c = 0L
      while (m.find()) c += 1
      TextKernels.regexCount(UTF8String.fromString(s), pat) == c
    }

  private val sortedLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted.toArray)

  property("sortedIntersectCount equals set-intersection size") =
    forAll(sortedLongs, sortedLongs) { (a, b) =>
      HashKernels.sortedIntersectCount(
        new GenericArrayData(a.map(Long.box(_): Any)),
        new GenericArrayData(b.map(Long.box(_): Any))) ==
        a.toSet.intersect(b.toSet).size.toLong
    }

  private val wsStrGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('\t'),
      Gen.const('\n'), Gen.const('\r'), Gen.const('\u000B'), Gen.const('\f'),
      Gen.const('é'), Gen.const('語')))
      .map(_.mkString.take(80))

  property("tokensWs equals filter(split(s, \\s+), nonEmpty); tokenCount equals its size") =
    forAll(wsStrGen) { s =>
      val want = s.split("\\s+").filter(_.nonEmpty).toSeq
      val got = TextKernels.tokensWs(UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      got == want &&
        TextKernels.tokenCount(UTF8String.fromString(s)) == want.size
    }

  private val gopherStops = Seq("the", "be", "to", "of", "and")

  property("contentTokenCount/contentTokens equal the filtered-token reference") =
    forAll(wsStrGen) { s =>
      val set = gopherStops.toSet
      val want = s.split("\\s+").filter(t => t.nonEmpty && !set(t)).toSeq
      val hs = new java.util.HashSet[UTF8String]()
      gopherStops.foreach(w => hs.add(UTF8String.fromString(w)))
      val got = TextKernels.contentTokens(UTF8String.fromString(s), hs)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      got == want &&
        TextKernels.contentTokenCount(UTF8String.fromString(s), hs) == want.size
    }

  property("nonWsCharCount equals length(regexp_replace(s, \\s, ''))") =
    forAll(wsStrGen) { s =>
      TextKernels.nonWsCharCount(UTF8String.fromString(s)) ==
        s.replaceAll("\\s", "").codePointCount(0, s.replaceAll("\\s", "").length)
    }

  property("gopherStats equals the per-field HOF references") =
    forAll(wsStrGen) { s0 =>
      val s = s0.toLowerCase
      val toks = s.split("\\s+").filter(_.nonEmpty).toSeq
      val row = TextKernels.gopherStats(UTF8String.fromString(s),
        gopherStops.map(UTF8String.fromString).toArray)
      row.getLong(0) == toks.size.toLong &&
        row.getLong(1) == toks.map(t => t.codePointCount(0, t.length).toLong).sum &&
        row.getLong(2) == toks.count(_.exists(c => c >= 'a' && c <= 'z')).toLong &&
        row.getInt(3) == toks.distinct.count(gopherStops.toSet)
    }

  property("wordNgrams equals the sliding-window join (repeats kept)") =
    forAll(Gen.listOf(Gen.oneOf("a", "bb", "ccc", "a", "d語")), Gen.chooseNum(1, 4)) {
      (toks, n) =>
        val want = if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString(" ")).toSeq
        val arr = new GenericArrayData(
          toks.map(t => UTF8String.fromString(t): Any).toArray)
        ShingleKernels.wordNgrams(arr, n)
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq == want
    }

  property("polyHash2 kernel equals the per-code-point fold") =
    forAll(strGen) { s =>
      val want = s.codePoints().toArray.foldLeft(0L)((a, c) =>
        (a * graft.functions.Hashes.PolyMul2 + c) % graft.functions.Hashes.PolyMod2)
      HashKernels.polyHash2(UTF8String.fromString(s)) == want
    }

  property("sortedMemberCount equals sortedIntersectCount on sorted-distinct inputs") =
    forAll(sortedLongs, sortedLongs) { (a, b) =>
      val aa = new GenericArrayData(a.map(Long.box(_): Any))
      val bb = new GenericArrayData(b.map(Long.box(_): Any))
      HashKernels.sortedMemberCount(aa, bb) ==
        HashKernels.sortedIntersectCount(aa, bb) &&
      HashKernels.sortedMemberCount(aa, bb) ==
        a.toSet.intersect(b.toSet).size.toLong
    }

  property("simhashBits of identical hash arrays collide; empty gives 0") =
    forAll(Gen.listOf(Gen.long).map(_.toArray)) { hs =>
      val arr = new GenericArrayData(hs.map(Long.box(_): Any))
      val a = HashKernels.simhashBits(arr, 30)
      val b = HashKernels.simhashBits(arr, 30)
      a == b && (hs.nonEmpty || a == 0L) && (a >> 30) == 0L
    }

  property("minhash slots never increase when the input set grows") =
    forAll(Gen.nonEmptyListOf(Gen.long), Gen.nonEmptyListOf(Gen.long)) { (xs, extra) =>
      val a = Dedup2.affine(4)
      val base = HashKernels.minhashSlots(
        new GenericArrayData(xs.map(Long.box(_): Any)), a._1, a._2)
      val grown = HashKernels.minhashSlots(
        new GenericArrayData((xs ++ extra).map(Long.box(_): Any)), a._1, a._2)
      (0 until 4).forall(i => grown.getLong(i) <= base.getLong(i))
    }

  private object Dedup2 {
    def affine(k: Int): (Array[Long], Array[Long]) = (
      Array.tabulate(k)(i => graft.operators.Dedup.affineA(i)),
      Array.tabulate(k)(i => graft.operators.Dedup.affineB(i)))
  }
}
