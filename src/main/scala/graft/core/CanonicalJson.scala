package graft.core

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** Canonical JSON serialization compatible with Python's
  * `json.dumps(obj, sort_keys=True, ensure_ascii=False)` — the form the
  * reference hashes for content-addressed IDs
  * (reference: src/lakehouse/ids.py:34-53).
  *
  * Compatibility points:
  *  - object keys sorted lexicographically; separators ", " and ": ";
  *  - floats rendered with Python `repr` semantics (shortest decimal that
  *    round-trips, always at least one fractional digit);
  *  - strings escaped minimally (", \\, and control chars only; non-ASCII
  *    kept literal — ensure_ascii=False).
  */
object CanonicalJson {

  sealed trait JValue
  final case class JStr(v: String) extends JValue
  final case class JFloat(v: Double) extends JValue
  final case class JInt(v: Long) extends JValue
  final case class JArr(v: Seq[JValue]) extends JValue
  final case class JObj(v: Seq[(String, JValue)]) extends JValue

  /** Python round(x, n): correctly-rounded HALF_EVEN on the exact binary
    * value of the double. */
  def pyRound(x: Double, scale: Int): Double =
    if (x.isNaN || x.isInfinite) x
    else new JBigDecimal(x).setScale(scale, RoundingMode.HALF_EVEN).doubleValue()

  /** Python repr() of a finite double in the non-scientific range:
    * the shortest decimal string that parses back to the same double,
    * with ".0" appended for integral values. */
  def pyFloatRepr(x: Double): String = {
    require(!x.isNaN && !x.isInfinite, "non-finite floats are not JSON")
    if (x == math.rint(x) && math.abs(x) < 1e16) {
      // integral doubles print as "<int>.0"
      val l = x.toLong
      if (l == 0 && (1.0 / x) < 0) "-0.0" else s"$l.0"
    } else if ({
      // fast path for exact short decimals (the ID pipeline rounds
      // timestamps to 2 dp first, so nearly every non-integral input
      // lands here): skip the %g search loop entirely
      val cents = math.rint(x * 100)
      math.abs(cents) < 1e15 &&
        JBigDecimal.valueOf(cents.toLong, 2).doubleValue() == x
    }) {
      val bd = JBigDecimal.valueOf(math.rint(x * 100).toLong, 2).stripTrailingZeros()
      val s = bd.toPlainString
      if (s.indexOf('.') >= 0) s else s + ".0"
    } else {
      var s: String = null
      var p = 1
      while (s == null && p <= 17) {
        val cand = String.format("%." + p + "g", Double.box(x))
        val cleaned = cleanupG(cand)
        if (cleaned.toDouble == x) s = cleaned
        p += 1
      }
      if (s == null) x.toString else s
    }
  }

  /** %g can emit trailing zeros and exponent forms Java-style; normalize
    * toward Python's repr ("1e+23" style exponents, no trailing zeros). */
  private def cleanupG(s0: String): String = {
    var s = s0
    if (s.contains('e') || s.contains('E')) {
      val Array(m0, e0) = s.toLowerCase.split("e")
      var m = m0
      if (m.contains('.')) m = m.reverse.dropWhile(_ == '0').reverse
      if (m.endsWith(".")) m = m.dropRight(1)
      val expSign = if (e0.startsWith("-")) "-" else "+"
      val eDigits = e0.dropWhile(c => c == '+' || c == '-').dropWhile(_ == '0') match {
        case "" => "0"
        case d if d.length == 1 => "0" + d
        case d => d
      }
      s = s"${m}e$expSign$eDigits"
    } else if (s.contains('.')) {
      s = s.reverse.dropWhile(_ == '0').reverse
      if (s.endsWith(".")) s = s.dropRight(1)
    }
    s
  }

  def escape(s: String): String = {
    // fast path: nothing to escape (virtually all transcript text)
    var i = 0
    val n = s.length
    var clean = true
    while (clean && i < n) {
      val c = s.charAt(i)
      if (c == '"' || c == '\\' || c < ' ') clean = false
      i += 1
    }
    if (clean) return s
    val sb = new java.lang.StringBuilder(n + 8)
    i = 0
    while (i < n) {
      s.charAt(i) match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def render(v: JValue): String = v match {
    case JStr(s)   => "\"" + escape(s) + "\""
    case JFloat(d) => pyFloatRepr(d)
    case JInt(l)   => l.toString
    case JArr(xs)  => xs.map(render).mkString("[", ", ", "]")
    case JObj(kv)  => kv.sortBy(_._1)
      .map { case (k, x) => "\"" + escape(k) + "\": " + render(x) }
      .mkString("{", ", ", "}")
  }
}
