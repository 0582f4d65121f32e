package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, TextFunctions => TF}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  * All pure Column expressions / DataFrame plans — no UDFs.
  */
object TextAnalysis {

  /** BPE-ish token count: runs of alphanumerics count as one token each,
    * every other non-space character counts alone — a cheap, deterministic
    * proxy for subword tokenizers. ASCII-safe pattern shared verbatim with
    * the SQL oracle. */
  val BpeTokenPattern = "[a-z0-9]+|[^a-z0-9\\s]"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeTokenPattern), lit(0)))

  /** Heuristic document quality score in [0,1]
    * (reference analog: length/stopword/punctuation proxies,
    * src/lakehouse/quality/metrics/text_quality.py):
    *   0.4·min(1, tokens/50) + 0.3·(1 − stopwordRatio) + 0.3·min(1, meanWordLen/8).
    * One double expression tree — deterministic cross-engine. */
  def qualityScore(text: Column): Column = {
    val nTok = TF.tokenCount(text).cast("double")
    val nContent = TF.contentTokenCount(text).cast("double")
    val chars = length(regexp_replace(text, "\\s", "")).cast("double")
    val stopRatio = when(nTok === 0.0, lit(1.0)).otherwise(lit(1.0) - nContent / nTok)
    val meanWordLen = when(nTok === 0.0, lit(0.0)).otherwise(chars / nTok)
    lit(0.4) * least(lit(1.0), nTok / 50.0) +
      lit(0.3) * (lit(1.0) - stopRatio) +
      lit(0.3) * least(lit(1.0), meanWordLen / 8.0)
  }

  /** Rolling-hash fingerprint of normalized text (content addressing /
    * shift-resistant chunk keys). SQL-replicable via polyHash. */
  def fingerprint(text: Column): Column = Hashes.polyHash(TF.normalizeWs(text))

  /** Character-trigram profile language ID, self-trained:
    *  1. "train": top `profileSize` char trigrams per label from a labeled
    *     corpus (df with labelCol), ranked by frequency;
    *  2. classify: each document scores every label by the count of its
    *     distinct trigrams that appear in the label's profile; argmax wins
    *     (ties broken by label order).
    * Returns (idCol, predicted). Both phases are joins + window ranks —
    * no driver-side model object, so it scales to any corpus size. */
  def langIdByTrigramProfile(df: DataFrame, idCol: String, textCol: Column,
      labelCol: String, profileSize: Int = 50): DataFrame = {
    graft.expressions.TextExprs.register(df.sparkSession)
    // single-pass codegen kernel for the distinct trigrams (the
    // transform+array_distinct formulation interprets a lambda per char).
    // localCheckpoint (not cache) because both the train and classify
    // phases scan it: same reuse, but the blocks are freed by the
    // ContextCleaner once the plan is dropped instead of pinning executor
    // storage for the session's lifetime. At 100 TB this becomes an
    // explicit materialized table.
    val grams = df.withColumn("_norm", TF.normalizeWs(textCol))
      .select(col(idCol), col(labelCol),
        explode(graft.expressions.TextExprs.distinct_char_ngrams(col("_norm"), 3)).as("g"))
      .localCheckpoint(false)
    // train: per-label top trigrams
    val profile = grams.groupBy(col(labelCol).as("plabel"), col("g"))
      .agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(
        Window.partitionBy("plabel").orderBy(col("n").desc, col("g"))))
      .filter(col("r") <= profileSize)
      .select("plabel", "g")
    // classify: score = |doc trigrams ∩ label profile|
    val scores = grams.select(col(idCol), col("g"))
      .join(broadcast(profile), "g")
      .groupBy(col(idCol), col("plabel"))
      .agg(count(lit(1)).as("score"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("plabel"))
    scores.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col(idCol), col("plabel").as("predicted"))
  }
}
