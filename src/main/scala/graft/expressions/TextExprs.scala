package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels used by the language-ID and shingling hot paths. */
object TextKernels {

  /** Distinct character n-grams of a string, first-occurrence order —
    * the single-pass equivalent of
    * `array_distinct(transform(sequence(1, len-n+1), i -> substr(s,i,n)))`.
    * Steps by Unicode code point, matching Spark's `substr` (and DuckDB's
    * `substr`) character semantics. */
  def distinctCharNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    val cpCount = str.codePointCount(0, str.length)
    if (cpCount < n) return new GenericArrayData(Array.empty[Any])
    // char offset of each code point start (cpCount + 1 sentinel)
    val starts = new Array[Int](cpCount + 1)
    var ci = 0
    var cp = 0
    while (ci < str.length) {
      starts(cp) = ci
      ci += Character.charCount(str.codePointAt(ci))
      cp += 1
    }
    starts(cpCount) = str.length
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= cpCount) {
      seen.add(str.substring(starts(i), starts(i + n)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Count of regex matches — `size(regexp_extract_all(s, p, 0))` without
    * allocating the match array. Java `find()` advances past zero-width
    * matches itself, so the count equals RegExpExtractAll's length. */
  def regexCount(s: UTF8String, p: java.util.regex.Pattern): Long = {
    val m = p.matcher(s.toString)
    var c = 0L
    while (m.find()) c += 1
    c
  }

  /** Java-regex `\s` over raw UTF-8 bytes: the six ASCII whitespace
    * chars (regex \s is ASCII-only without UNICODE_CHARACTER_CLASS);
    * multi-byte UTF-8 code units have the high bit set, so a byte test
    * can never split inside a character. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Number of whitespace-separated tokens — bit-equal to
    * `size(filter(split(s, "\\s+"), t -> length(t) > 0))` (the maximal
    * non-whitespace runs) with ZERO allocation: the HOF chain builds the
    * split array, a lambda frame per element and the filtered copy, and
    * `ArrayFilter` is CodegenFallback (interpreted per row). This is the
    * hottest scalar in the text battery (every n_tok / token-stat path). */
  def tokenCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0; var c = 0; var in = false
    while (i < n) {
      val ws = isWs(s.getByte(i))
      if (!ws && !in) { c += 1; in = true }
      else if (ws) in = false
      i += 1
    }
    c
  }

  /** Whitespace tokens, empties dropped — element-equal to
    * `filter(split(s, "\\s+"), t -> length(t) > 0)`. One byte pass; each
    * token is a zero-copy slice of one shared byte array. */
  def tokensWs(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // one copy; slices share it
    val n = bytes.length
    // count first: exact-size output array, no growable buffer
    var i = 0; var c = 0; var in = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (!ws && !in) { c += 1; in = true }
      else if (ws) in = false
      i += 1
    }
    if (c == 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](c)
    var k = 0; var start = 0
    i = 0; in = false
    while (i < n) {
      val ws = isWs(bytes(i))
      if (!ws && !in) { start = i; in = true }
      else if (ws && in) {
        out(k) = UTF8String.fromBytes(bytes, start, i - start); k += 1
        in = false
      }
      i += 1
    }
    if (in) { out(k) = UTF8String.fromBytes(bytes, start, n - start); k += 1 }
    new GenericArrayData(out)
  }

  /** Count of tokens NOT in `stop` — value-equal to
    * `size(filter(tokens(s), t -> !array_contains(stopArr, t)))` (the
    * interpreted form paid an ArrayFilter lambda frame plus a linear
    * array_contains scan per token). One byte pass, one UTF8String slice
    * per token. */
  def contentTokenCount(s: UTF8String,
      stop: java.util.HashSet[UTF8String]): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0; var c = 0; var start = 0; var in = false
    while (i <= n) {
      val ws = i == n || isWs(bytes(i))
      if (!ws && !in) { start = i; in = true }
      else if (ws && in) {
        if (!stop.contains(UTF8String.fromBytes(bytes, start, i - start))) c += 1
        in = false
      }
      i += 1
    }
    c
  }

  /** Tokens NOT in `stop`, order- and duplicate-preserving — element-
    * equal to `filter(tokens(s), t -> !array_contains(stopArr, t))`. */
  def contentTokens(s: UTF8String,
      stop: java.util.HashSet[UTF8String]): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val buf = new scala.collection.mutable.ArrayBuffer[Any](8)
    var i = 0; var start = 0; var in = false
    while (i <= n) {
      val ws = i == n || isWs(bytes(i))
      if (!ws && !in) { start = i; in = true }
      else if (ws && in) {
        val t = UTF8String.fromBytes(bytes, start, i - start)
        if (!stop.contains(t)) buf += t
        in = false
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Characters that are not regex-`\s` whitespace — value-equal to
    * `length(regexp_replace(s, "\\s", ""))` without building the
    * replaced string. Character count = non-continuation UTF-8 bytes
    * ((b & 0xC0) != 0x80, the `numChars` device); the six `\s` chars are
    * single ASCII bytes. */
  def nonWsCharCount(s: UTF8String): Int = {
    val n = s.numBytes()
    var i = 0; var chars = 0; var ws = 0
    while (i < n) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) chars += 1
      if (isWs(b)) ws += 1
      i += 1
    }
    chars - ws
  }

  /** The per-document Gopher signal battery in ONE byte pass over the
    * (already-lowercased) text: (n_tok, char_sum, alpha_words,
    * stop_hits) — value-equal to
    *   n_tok      = size(tokens(s))                       [cast long]
    *   char_sum   = aggregate(transform(tokens(s), length), 0, +)
    *   alpha_words= size(filter(tokens(s), t -> t.rlike("[a-z]")))
    *   stop_hits  = size(array_intersect(array_distinct(tokens(s)), stops))
    * The HOF battery walked the token array four times per row with
    * interpreted lambdas; stop_hits counts DISTINCT stop words present
    * (bitmask — the caller's stop list is ≤ 64 entries). */
  def gopherStats(s: UTF8String, stops: Array[UTF8String]): org.apache.spark.sql.catalyst.InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0; var start = 0; var in = false
    var nTok = 0L; var charSum = 0L; var alpha = 0L
    var stopMask = 0L
    var tokChars = 0; var tokAlpha = false
    while (i <= n) {
      val b: Byte = if (i == n) ' ' else bytes(i)
      val ws = isWs(b)
      if (!ws) {
        if (!in) { start = i; in = true; tokChars = 0; tokAlpha = false }
        if ((b & 0xC0) != 0x80) tokChars += 1
        if (b >= 'a' && b <= 'z') tokAlpha = true
      } else if (in) {
        nTok += 1; charSum += tokChars; if (tokAlpha) alpha += 1
        var k = 0
        while (k < stops.length) {
          if ((stopMask & (1L << k)) == 0 &&
              stops(k).numBytes == i - start &&
              UTF8String.fromBytes(bytes, start, i - start) == stops(k))
            stopMask |= 1L << k
          k += 1
        }
        in = false
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, charSum, alpha, java.lang.Long.bitCount(stopMask)))
  }
}

object ShingleKernels {

  /** Distinct word n-gram shingles of a token array, space-joined,
    * first-occurrence order — one pass over the tokens instead of the
    * interpreted transform(sequence…slice…concat_ws) + array_distinct
    * chain (which allocates a lambda frame and a sliced array per
    * shingle). */
  def distinctWordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements() - (n - 1)
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](toks.numElements())
    var i = 0
    while (i < words.length) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-gram shingles (repeats kept, window order), space-joined
    * — one pass instead of the interpreted
    * transform(sequence…slice…concat_ws) chain (a lambda frame and a
    * sliced array per shingle). Element-equal to
    * [[graft.functions.TextFunctions.wordShinglesOfTokens]]. */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements() - (n - 1)
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val words = new Array[String](toks.numElements())
    var i = 0
    while (i < words.length) { words(i) = toks.getUTF8String(i).toString; i += 1 }
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Ascending-sorted xxhash64 (Spark seed 42) of each string element —
    * the sorted-long-set encoding used for exact set-intersection counts.
    * Matches `array_sort(transform(a, s -> xxhash64(s)))` exactly. */
  def xxSortedHash(arr: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.StringType
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = hs(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** Codegen-friendly distinct-char-ngram expression (n fixed at plan time). */
case class DistinctCharNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.distinctCharNgrams(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.distinctCharNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Distinct word-ngram shingles over a token-array column. */
case class DistinctWordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleKernels.distinctWordNgrams(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleKernels.distinctWordNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Regex match count without materializing the matches: the
  * `size(regexp_extract_all(x, p, 0))` idiom allocates a UTF8String per
  * match per row just to take the array's length — at a 100 TB PII scan
  * that is the dominant allocation. Same count semantics as
  * RegExpExtractAll (Java `find()` loop, zero-width handled by the
  * matcher). Pattern compiles once at plan time. */
case class RegexCountExpr(child: Expression, pattern: String) extends UnaryExpression {
  @transient private lazy val compiled = java.util.regex.Pattern.compile(pattern)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(v: Any): Any =
    TextKernels.regexCount(v.asInstanceOf[UTF8String], compiled)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patRef = ctx.addReferenceObj("regexCountPat",
      java.util.regex.Pattern.compile(pattern), "java.util.regex.Pattern")
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.regexCount($c, $patRef)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Sorted xxhash64 array of a string array (set-intersection encoding). */
/** Kernel for [[CharHistExpr]]: CODEPOINT histogram counts, ascending
  * codepoint order (deterministic; downstream decimal sums are order-free
  * anyway). Codepoints, not UTF-16 units, so the count matches a
  * character-semantics engine (DuckDB `length`) on non-BMP text too. */
object EntropyKernels {
  def charHist(s: UTF8String): ArrayData = {
    val str = s.toString
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    val out = new Array[Long](counts.size)
    var j = 0
    val it = counts.values().iterator()
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Map-only codepoint histogram of a string column (array<long> counts;
  * which codepoint each count belongs to is deliberately dropped — the
  * entropy consumers only need the multiset). One O(len) pass per row
  * inside whole-stage codegen. */
case class CharHistExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    EntropyKernels.charHist(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.EntropyKernels.charHist($v)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class TokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(v: Any): Any =
    TextKernels.tokenCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.tokenCount($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class TokensWsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.tokensWs(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.tokensWs($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ContentTokenCountExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {
  @transient private lazy val set = {
    val s = new java.util.HashSet[UTF8String]()
    stops.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(v: Any): Any =
    TextKernels.contentTokenCount(v.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.contentTokenCount($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class ContentTokensExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {
  @transient private lazy val set = {
    val s = new java.util.HashSet[UTF8String]()
    stops.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    TextKernels.contentTokens(v.asInstanceOf[UTF8String], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.contentTokens($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleKernels.wordNgrams(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleKernels.wordNgrams($c, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class NonWsCharCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(v: Any): Any =
    TextKernels.nonWsCharCount(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextKernels.nonWsCharCount($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class GopherStatsExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression {
  require(stops.size <= 64, "gopher stop list must fit a 64-bit mask")
  @transient private lazy val arr: Array[UTF8String] =
    stops.map(UTF8String.fromString).toArray
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tok",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("char_sum",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("alpha_words",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("stop_hits",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullSafeEval(v: Any): Any =
    TextKernels.gopherStats(v.asInstanceOf[UTF8String], arr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gopherStops", arr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TextKernels.gopherStats($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class XxSortedHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    ShingleKernels.xxSortedHash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleKernels.xxSortedHash($c)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TextExprs {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_distinct_char_ngrams",
      es => DistinctCharNgramsExpr(es(0), ExprArgs.litInt(es(1), "graft_distinct_char_ngrams")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_distinct_word_ngrams",
      es => DistinctWordNgramsExpr(es(0), ExprArgs.litInt(es(1), "graft_distinct_word_ngrams")),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_xx_sorted_hash", es => XxSortedHashExpr(es(0)), "built-in")
  }

  /** Eagerly-bound regex-count Column (pattern is a per-call payload —
    * same reasoning as nearest_cell: no registry, no late resolution). */
  def regex_count(s: Column, pattern: String): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(RegexCountExpr(ColumnShim.expression(s), pattern))
  }

  /** Requires [[register]] on the executing session. */
  def distinct_char_ngrams(s: Column, n: Int): Column =
    call_function("graft_distinct_char_ngrams", s, org.apache.spark.sql.functions.lit(n))

  def distinct_word_ngrams(toks: Column, n: Int): Column =
    call_function("graft_distinct_word_ngrams", toks, org.apache.spark.sql.functions.lit(n))

  def xx_sorted_hash(a: Column): Column = call_function("graft_xx_sorted_hash", a)

  /** Eagerly-bound codepoint histogram (no registry — the nearest_cell
    * convention). */
  def char_hist(s: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(CharHistExpr(ColumnShim.expression(s)))
  }

  /** Eagerly-bound zero-alloc token count (no registry — every text
    * operator calls this through [[graft.functions.TextFunctions]]
    * without a session in hand). */
  def token_count(s: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(TokenCountExpr(ColumnShim.expression(s)))
  }

  /** Eagerly-bound single-pass whitespace tokenizer (see [[token_count]]). */
  def tokens_ws(s: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(TokensWsExpr(ColumnShim.expression(s)))
  }

  /** Eagerly-bound stop-filtered token count (one pass, set membership). */
  def content_token_count(s: Column, stops: Seq[String]): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(ContentTokenCountExpr(ColumnShim.expression(s), stops))
  }

  /** Eagerly-bound stop-filtered tokenizer. */
  def content_tokens(s: Column, stops: Seq[String]): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(ContentTokensExpr(ColumnShim.expression(s), stops))
  }

  /** Eagerly-bound one-pass word n-gram shingler (ALL windows, repeats
    * kept — the counting sibling of `graft_distinct_word_ngrams`). */
  def word_ngrams(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(WordNgramsExpr(ColumnShim.expression(toks), n))
  }

  /** Eagerly-bound non-whitespace character count. */
  def non_ws_char_count(s: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(NonWsCharCountExpr(ColumnShim.expression(s)))
  }

  /** Eagerly-bound one-pass Gopher signal struct
    * (n_tok, char_sum, alpha_words, stop_hits). */
  def gopher_stats(s: Column, stops: Seq[String]): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(GopherStatsExpr(ColumnShim.expression(s), stops))
  }
}
