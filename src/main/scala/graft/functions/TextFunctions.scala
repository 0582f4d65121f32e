package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives used by dedup, text-quality and catalog operators.
  *
  * All are pure `Column` expressions (codegen-able, no UDFs), mirroring the
  * reference's row-at-a-time helpers
  * (reference: src/lakehouse/quality/metrics/integrity.py:460-476 for
  * normalization, text_quality.py:119-121,225-228 for tokenization).
  */
object TextFunctions {

  /** Whitespace-collapsing lowercase normalization used for dedup keys. */
  def normalizeWs(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace tokens, empties dropped. Stays the split+filter form
    * DELIBERATELY (r15): the single-pass byte-walk kernel
    * (`TextExprs.tokens_ws`, kept for callers that want it) measured
    * 25–50 % SLOWER on the minhash/jaccard array paths (q113 A/B in one
    * window: 1.6 s HOF vs 2.0–2.5 s kernel) — the kernel's getBytes copy
    * + object-array output lose to split's compiled-regex path when the
    * full token ARRAY is consumed downstream. The counting form
    * ([[tokenCount]]) is where the kernel wins (zero allocation). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Token count without materializing the token array at all (one byte
    * pass, zero allocation) — the hottest scalar in the text battery. */
  def tokenCount(text: Column): Column =
    graft.expressions.TextExprs.token_count(text)

  /** A small, conventional English stopword list (public knowledge; the
    * reference ships its own ~120-word list — semantics, not contents,
    * are what we reproduce: filter function words before term stats). */
  val stopwords: Seq[String] = Seq(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "or", "that", "the",
    "this", "to", "was", "were", "will", "with")

  /** Tokens with stopwords removed (order- and duplicate-preserving).
    * Codegen one-pass kernel with hash-set membership — the previous
    * `filter(tokens, !array_contains(stopArr, t))` paid an interpreted
    * ArrayFilter lambda plus a linear stop-list scan per token. */
  def contentTokens(text: Column, stop: Seq[String] = stopwords): Column =
    graft.expressions.TextExprs.content_tokens(text, stop)

  def contentTokenCount(text: Column, stop: Seq[String] = stopwords): Column =
    graft.expressions.TextExprs.content_token_count(text, stop)

  /** Punctuation chars / non-whitespace chars (reference:
    * text_quality.py:280-391). Safe on empty strings (returns 0.0). */
  def punctRatio(text: Column): Column = {
    val nonWs = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(nonWs === 0, 0.0).otherwise(punct.cast("double") / nonWs.cast("double"))
  }

  /** Character n-gram shingles of the normalized text (for MinHash/Jaccard).
    * Empty array when the text is shorter than n (guarded: Spark `sequence`
    * descends when stop < start). */
  def charShingles(text: Column, n: Int): Column =
    charShinglesOfNormalized(normalizeWs(text), n)

  /** Shingles over an ALREADY-normalized column. Prefer materializing the
    * normalized text as its own column first — the lambda reads it per
    * element, so it must be a cheap attribute, not a regexp expression. */
  def charShinglesOfNormalized(norm: Column, n: Int): Column = {
    val cnt = length(norm) - (n - 1)
    when(cnt < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt), i => norm.substr(i, lit(n))))
  }

  /** Word n-gram shingles (e.g. for n-gram Jaccard dedup). */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOfTokens(tokens(text), n)

  /** ALL word n-grams of a token-array column (repeats kept, window
    * order, space-joined). Codegen one-pass kernel — the previous
    * when-guarded transform(sequence…slice…concat_ws) chain interpreted
    * a lambda frame and allocated a sliced array per shingle; values are
    * identical including the empty array for < n tokens. */
  def wordShinglesOfTokens(toks: Column, n: Int): Column =
    graft.expressions.TextExprs.word_ngrams(toks, n)
}
