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

  /** Whitespace tokens, empties dropped. Codegen single-pass kernel —
    * element-equal to `filter(split(text, "\\s+"), t -> length(t) > 0)`,
    * whose `ArrayFilter` HOF is CodegenFallback (interpreted per row,
    * one lambda frame per element plus the filtered copy). */
  def tokens(text: Column): Column =
    graft.expressions.TextExprs.tokens_ws(text)

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

  private def stopArray(stop: Seq[String]): Column = array(stop.map(lit): _*)

  /** Tokens with stopwords removed (order- and duplicate-preserving). */
  def contentTokens(text: Column, stop: Seq[String] = stopwords): Column =
    filter(tokens(text), t => !array_contains(stopArray(stop), t))

  def contentTokenCount(text: Column, stop: Seq[String] = stopwords): Column =
    size(contentTokens(text, stop))

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

  /** Word n-gram shingles (e.g. for n-gram Jaccard dedup).
    * NOTE: prefer [[wordShinglesOfTokens]] over a materialized token
    * column in hot paths — here `tokens(text)` is referenced inside the
    * per-element lambda, so Catalyst re-evaluates the split per shingle. */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesOfTokens(tokens(text), n)

  /** Shingles over an already-materialized token-array column (cheap
    * per-element attribute access instead of re-splitting). */
  def wordShinglesOfTokens(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    when(cnt < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), cnt - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }
}
