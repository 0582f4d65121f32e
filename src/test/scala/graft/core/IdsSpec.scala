package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference tests/test_ids.py: determinism, order-independence,
  * float rounding, format validation — plus golden values computed with
  * the reference algorithm (CPython hashlib+json) to pin exact parity. */
class IdsSpec extends AnyFunSuite {

  test("golden: simple utterance id matches reference algorithm") {
    assert(Ids.utteranceId("TEST-001", 0, "Hello, world!", "Alice", 0.0, 5.0)
      == "utt_d16625aea1b2_000000_e99a322f")
  }

  test("golden: unicode text, escapes, float-repr edge cases") {
    assert(Ids.utteranceId("EP – æøå 中文", 3, "naïve café — 中文 test",
      "Bob \"B\" O'x", 1.004999, 2.345) == "utt_62729f8404fb_000003_cd2d5f47")
  }

  test("golden: large timestamps and sub-unit values") {
    assert(Ids.utteranceId("E", 12, "x", "s", 0.125, 1000000.33)
      == "utt_a9f51566bd67_000012_d23f9b28")
  }

  test("golden: span/beat/section ids with sorted child lists") {
    assert(Ids.spanId("TEST-001", 1, "Alice", Seq("utt_b", "utt_a"), "Hello world")
      == "spn_d16625aea1b2_000001_58118fdb")
    assert(Ids.beatId("TEST-001", 2, Seq("spn_b", "spn_a"), "Topic content")
      == "bet_d16625aea1b2_000002_d5ba2554")
    assert(Ids.sectionId("TEST-001", 3, Seq("bet_b", "bet_a"), "Section content")
      == "sec_d16625aea1b2_000003_07d7ad16")
  }

  test("ids are stable across runs and child-list order") {
    val a = Ids.spanId("E", 0, "S", Seq("u1", "u2"), "t")
    val b = Ids.spanId("E", 0, "S", Seq("u2", "u1"), "t")
    assert(a == b)
  }

  test("timestamps rounded to 2 decimals before hashing (test_ids.py:161-180)") {
    val a = Ids.utteranceId("E", 0, "t", "s", 1.001, 2.004)
    val b = Ids.utteranceId("E", 0, "t", "s", 1.0009, 2.0041)
    assert(a == b)
    val c = Ids.utteranceId("E", 0, "t", "s", 1.01, 2.0)
    assert(a != c)
  }

  test("position changes the id; content changes the id") {
    val base = Ids.utteranceId("E", 0, "t", "s", 0.0, 1.0)
    assert(base != Ids.utteranceId("E", 1, "t", "s", 0.0, 1.0))
    assert(base != Ids.utteranceId("E", 0, "u", "s", 0.0, 1.0))
  }

  test("format validation (ids.py:210-258)") {
    assert(Ids.isValidFormat("utt_d16625aea1b2_000000_e99a322f", "utterance"))
    assert(!Ids.isValidFormat("utt_d16625aea1b2_000000_e99a322f", "span"))
    assert(!Ids.isValidFormat("invalid", "utterance"))
    assert(!Ids.isValidFormat("utt_xyz_0_ab", "utterance"))
  }

  test("length is 32 (reference known-value test)") {
    assert(Ids.utteranceId("TEST-001", 0, "Stability test", "Alice", 0.0, 5.0).length == 32)
  }

  test("negative positions are rejected, not silently mis-padded") {
    intercept[IllegalArgumentException] {
      Ids.utteranceId("TEST-001", -5, "x", "Alice", 0.0, 5.0)
    }
  }

  test("pyFloatRepr matches Python repr on representative values") {
    import CanonicalJson.pyFloatRepr
    assert(pyFloatRepr(5.0) == "5.0")
    assert(pyFloatRepr(0.0) == "0.0")
    assert(pyFloatRepr(1.0) == "1.0")
    assert(pyFloatRepr(2.35) == "2.35")
    assert(pyFloatRepr(0.1 + 0.2) == "0.30000000000000004")
    assert(pyFloatRepr(1000000.33) == "1000000.33")
    assert(pyFloatRepr(0.5) == "0.5")
    assert(pyFloatRepr(-2.5) == "-2.5")
  }

  test("pyRound is Python round (half-even on exact binary value)") {
    import CanonicalJson.pyRound
    assert(pyRound(1.004999, 2) == 1.0)
    assert(pyRound(2.675, 2) == 2.67) // binary 2.675 is just below the tie
    assert(pyRound(2.345, 2) == 2.35)
  }
}
