package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, TextFunctions => TF}
import graft.ingest.Layout
import graft.operators.{Corpus, Dedup, TextAnalysis}

/** Knobs of the composed curation run. Defaults match the constants the
  * individual audit queries pin (q19/q108 minhash 12-in-3-bands at 0.5,
  * q121's minWords=5 Gopher bounds, q57's benchMod=20 / 3-gram / 0.2
  * decontamination, q106's 1.25/1.4 UniMax budget, q110's 16 shards), so
  * the end-to-end oracle (q122) replays exactly the already-proven stage
  * semantics. */
case class CurateConfig(
    shingleWords: Int = 2,
    minhashK: Int = 12,
    bands: Int = 3,
    threshold: Double = 0.5,
    maxBucket: Int = Dedup.DefaultMaxBucket,
    gopherMinWords: Int = 5,
    gopherMaxWords: Int = 100000,
    gopherMinStops: Int = 1,
    benchMod: Int = 20,
    contamN: Int = 3,
    contamFrac: Double = 0.2,
    budgetFrac: Double = 1.25,
    maxEpochs: Double = 1.4,
    nShards: Int = 16)

/** X129: the composed end-to-end curation RUN — the one product shape the
  * per-operator library did not have. The reference's signature entry
  * point is a chained DAG run (reference:
  * src/lakehouse/cli/commands/materialize.py:70 chains
  * spans→beats→sections→embeddings→index as ONE command); this is that
  * shape applied to the training-data domain:
  *
  *   raw documents
  *     → exact dedup (keep min doc_id per normalized text; X1/q09)
  *     → capped MinHash near-dup + best-of-cluster keep (X104/X112; q19/q108)
  *     → Gopher composite rule gate (X128; q121)
  *     → benchmark n-gram decontamination drop (X32; q57)
  *     → quality-decile curriculum sample (X71; q58)
  *     → UniMax mixture resampling (X109; q106)
  *     → deterministic training shards (X114; q110)
  *
  * Every stage keep-decision is the APPLY form of an operator whose audit
  * query is already individually oracle-checked, and the composed chain
  * is itself oracle-replayed end-to-end: q122 emits one accounting row
  * per stage — (n_docs, n_tokens, id_sum) — and the DuckDB oracle
  * re-derives the entire keep-decision chain in SQL, so a single
  * misrouted document anywhere in the pipeline breaks the hash.
  *
  * Scale shape, stage by stage: exact dedup is one text-keyed agg + one
  * semi-join (at 100 TB the group key becomes the q26 fingerprint with an
  * in-group verify, the q120-documented escalation); near-dup is the
  * capped banded pipeline (no n²-row join — bucket cap + pair sliver);
  * the Gopher gate is map-only; decontamination broadcasts the
  * benchmark's gram set (bounded by benchmark size, never corpus size);
  * the curriculum window partitions by language; UniMax broadcasts one
  * row per source and the explode is bounded by ⌈maxEpochs⌉; sharding is
  * a map-only hash. Nothing in the chain holds corpus-sized state on one
  * node.
  */
object CuratePipeline {

  /** Stage names in execution order (element 0 is the raw input). */
  val StageNames: Seq[String] = Seq("raw", "exact", "neardup", "quality",
    "decontam", "curriculum", "mixture", "shards")

  private def withTok(docs: DataFrame): DataFrame =
    docs.withColumn("n_tok", TF.tokenCount(col("text")).cast("long"))

  /** Stage transitions as (name, (raw, previous) => next) — `raw` rides
    * along because decontamination defines the benchmark split on the
    * ORIGINAL corpus (a doc deduped away still contributes its grams to
    * the benchmark set, exactly as q57 does). */
  private[pipeline] def transitions(
      cfg: CurateConfig): Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
    "exact" -> ((_, prev) => exactStage(prev)),
    "neardup" -> ((_, prev) => neardupStage(prev, cfg)),
    "quality" -> ((_, prev) =>
      prev.filter(TextAnalysis.gopherRulePass(col("text"),
        cfg.gopherMinWords, cfg.gopherMaxWords, cfg.gopherMinStops))),
    "decontam" -> ((raw, prev) => decontamStage(raw, prev, cfg)),
    "curriculum" -> ((_, prev) => Corpus.applyCurriculum(prev)),
    "mixture" -> ((_, prev) =>
      Corpus.applyUnimax(prev, col("n_tok"), cfg.budgetFrac, cfg.maxEpochs)),
    "shards" -> ((_, prev) => shardStage(prev, cfg)))

  /** Keep the minimum doc_id per normalized text: one text-keyed agg with
    * map-side partials plus a semi-join back (no window sort). */
  private def exactStage(docs: DataFrame): DataFrame = {
    val keyed = docs.withColumn("_norm", TF.normalizeWs(col("text")))
    val keep = keyed.groupBy("_norm").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    keyed.join(keep, Seq("doc_id"), "left_semi").drop("_norm")
  }

  /** Capped banded MinHash pairs + quality-priority representative keep
    * (longest doc wins, ties to min id — the q108 contract). */
  private def neardupStage(docs: DataFrame, cfg: CurateConfig): DataFrame = {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", col("text"),
      cfg.shingleWords, cfg.minhashK, cfg.bands, cfg.threshold, cfg.maxBucket)
    Dedup.dedupByClusterBest(docs, "doc_id", pairs, col("n_tok"))
  }

  /** Drop benchmark members and any doc whose distinct word-n-gram
    * overlap with the benchmark's gram set reaches `contamFrac` — the
    * apply form of [[Corpus.decontaminationStats]]/q57's counting. */
  private def decontamStage(raw: DataFrame, prev: DataFrame,
      cfg: CurateConfig): DataFrame = {
    def grams = array_distinct(
      TF.wordShinglesOfTokens(TF.tokens(col("text")), cfg.contamN))
    val isBench = pmod(col("doc_id"), lit(cfg.benchMod)) === 0
    val benchGrams = raw.filter(isBench).select(explode(grams).as("g")).distinct()
    val withGrams = prev.withColumn("_grams", grams)
      .withColumn("_n_grams", size(col("_grams")))
    val matched = withGrams.select(col("doc_id"), explode(col("_grams")).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("_m"))
    withGrams.join(matched, Seq("doc_id"), "left")
      .filter(!isBench &&
        when(col("_n_grams") === 0, lit(0.0))
          .otherwise(coalesce(col("_m"), lit(0L)).cast("double") / col("_n_grams"))
          < cfg.contamFrac)
      .drop("_grams", "_n_grams", "_m")
  }

  /** Deterministic shard routing of (doc, copy) via the q110 Knuth
    * multiplicative device — copies of an upsampled doc spread across
    * shards instead of stacking in one training file. The fold into
    * [0, 2³¹) before the multiply keeps every product under 2⁶³ in both
    * engines. */
  private def shardStage(mix: DataFrame, cfg: CurateConfig): DataFrame =
    mix.withColumn("shard",
      pmod(pmod(pmod(col("doc_id") * 37 + col("copy"), lit(2147483648L))
        * 2654435761L, lit(4294967296L)), lit(cfg.nShards.toLong)).cast("int"))

  /** The lazily-composed stage frames, raw first. Each frame carries the
    * documents schema plus `n_tok`; mixture adds `copy`, shards adds
    * `shard`. */
  def stages(docs: DataFrame,
      cfg: CurateConfig = CurateConfig()): Seq[(String, DataFrame)] = {
    val raw = withTok(docs)
    transitions(cfg).scanLeft(("raw", raw)) {
      case ((_, prev), (name, f)) => (name, f(raw, prev))
    }
  }

  /** Per-stage accounting: (stage_idx, stage, n_docs, n_tokens, id_sum).
    * id_sum counts multiplicity after mixture; the shards row weights
    * each id by (shard + 1) so any misrouted document changes the
    * checksum. */
  def accounting(stageFrames: Seq[(String, DataFrame)]): DataFrame =
    stageFrames.zipWithIndex.map { case ((name, df), i) =>
      val idExpr =
        if (name == "shards") col("doc_id") * (col("shard") + lit(1)).cast("long")
        else col("doc_id")
      df.agg(
        count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(col("n_tok")), lit(0L)).cast("long").as("n_tokens"),
        coalesce(sum(idExpr), lit(0L)).cast("long").as("id_sum"))
        .select(lit(i).as("stage_idx"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"), col("id_sum"))
    }.reduce(_ unionByName _).orderBy("stage_idx")

  /** Materializing run: each stage lands as a committed
    * `curated/<stage>` [[Layout]] version (shards partitioned by shard),
    * with each stage READING BACK the previous stage's published files —
    * so a stage costs itself once, the chain restarts from any committed
    * prefix, and a crash mid-stage leaves only an unpublished version
    * behind (vacuum reclaims it). Returns the accounting table, itself
    * committed as `curated/accounting`. */
  def run(spark: SparkSession, docs: DataFrame, base: String,
      cfg: CurateConfig = CurateConfig()): DataFrame = {
    val raw = withTok(docs)
    val materialized = Seq.newBuilder[(String, DataFrame)]
    materialized += ("raw" -> raw)
    var prev = raw
    transitions(cfg).foreach { case (name, f) =>
      val parts = if (name == "shards") Seq("shard") else Nil
      val dir = Layout.writeVersioned(f(raw, prev), base, s"curated/$name",
        partitionCols = parts)
      prev = spark.read.parquet(dir)
      materialized += (name -> prev)
    }
    val acc = accounting(materialized.result())
    Layout.writeVersioned(acc, base, "curated/accounting")
    Layout.loadLatest(spark, base, "curated/accounting").orderBy("stage_idx")
  }
}
