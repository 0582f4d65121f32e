package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import graft.operators.{Dedup, Intervals, Stats}

/** Seven-category data-quality assessment engine with threshold-driven
  * RAG gating (reference: src/lakehouse/quality/assessor.py:467-843,
  * the metrics modules, thresholds.py:29-188).
  *
  * Each category is a handful of Spark aggregation/window jobs over
  * shared cached inputs; metric values are collected (they're tiny) and
  * threshold evaluation + RAG stay driver-side, exactly like the
  * reference's `ThresholdViolation` flow.
  */
object Quality {

  /** Full threshold table, defaults mirroring reference
    * thresholds.py:29-90 (PRD-derived) including the embedding-sanity
    * thresholds (FR-25/27/31). */
  final case class Thresholds(
      coverageMin: Double = 95.0,
      gapMaxPercent: Double = 2.0,
      overlapMaxPercent: Double = 2.0,
      spanLengthMin: Double = 20.0,
      spanLengthMax: Double = 120.0,
      spanComplianceMin: Double = 90.0,
      beatLengthMin: Double = 60.0,
      beatLengthMax: Double = 180.0,
      beatComplianceMin: Double = 90.0,
      timestampRegressionsMax: Long = 0,
      negativeDurationMax: Long = 0,
      exactDuplicateMaxPercent: Double = 1.0,
      nearDuplicateMaxPercent: Double = 3.0,
      nearDuplicateThreshold: Double = 0.95,
      sameSpeakerNeighborMaxPercent: Double = 60.0,
      sameEpisodeNeighborMaxPercent: Double = 70.0,
      lengthBiasCorrelationMax: Double = 0.3,
      adjacencyBiasMaxPercent: Double = 40.0,
      adjacencyToleranceSeconds: Double = 5.0,
      neighborK: Int = 10,
      neighborSampleSize: Int = 100,
      randomPairsSampleSize: Int = 500,
      neighborListSampleSize: Int = 30,
      outlierCount: Int = 20,
      topSpeakersCount: Int = 10)

  /** thresholds.py:120-188 `from_dict`/`apply_overrides`: snake_case keys
    * (the reference's field names), unknown keys ignored. */
  def thresholdsFrom(overrides: Map[String, String],
      base: Thresholds = Thresholds()): Thresholds =
    overrides.foldLeft(base) { case (t, (k, v)) =>
      k.trim match {
        case "coverage_min"                      => t.copy(coverageMin = v.trim.toDouble)
        case "gap_max_percent"                   => t.copy(gapMaxPercent = v.trim.toDouble)
        case "overlap_max_percent"               => t.copy(overlapMaxPercent = v.trim.toDouble)
        case "span_length_min"                   => t.copy(spanLengthMin = v.trim.toDouble)
        case "span_length_max"                   => t.copy(spanLengthMax = v.trim.toDouble)
        case "span_length_compliance_min"        => t.copy(spanComplianceMin = v.trim.toDouble)
        case "beat_length_min"                   => t.copy(beatLengthMin = v.trim.toDouble)
        case "beat_length_max"                   => t.copy(beatLengthMax = v.trim.toDouble)
        case "beat_length_compliance_min"        => t.copy(beatComplianceMin = v.trim.toDouble)
        case "timestamp_regressions_max"         => t.copy(timestampRegressionsMax = v.trim.toLong)
        case "negative_duration_max"             => t.copy(negativeDurationMax = v.trim.toLong)
        case "exact_duplicate_max_percent"       => t.copy(exactDuplicateMaxPercent = v.trim.toDouble)
        case "near_duplicate_max_percent"        => t.copy(nearDuplicateMaxPercent = v.trim.toDouble)
        case "near_duplicate_threshold"          => t.copy(nearDuplicateThreshold = v.trim.toDouble)
        case "same_speaker_neighbor_max_percent" => t.copy(sameSpeakerNeighborMaxPercent = v.trim.toDouble)
        case "same_episode_neighbor_max_percent" => t.copy(sameEpisodeNeighborMaxPercent = v.trim.toDouble)
        case "length_bias_correlation_max"       => t.copy(lengthBiasCorrelationMax = v.trim.toDouble)
        case "adjacency_bias_max_percent"        => t.copy(adjacencyBiasMaxPercent = v.trim.toDouble)
        case "adjacency_tolerance_seconds"       => t.copy(adjacencyToleranceSeconds = v.trim.toDouble)
        case "neighbor_k"                        => t.copy(neighborK = v.trim.toInt)
        case "neighbor_sample_size"              => t.copy(neighborSampleSize = v.trim.toInt)
        case "random_pairs_sample_size"          => t.copy(randomPairsSampleSize = v.trim.toInt)
        case "neighbor_list_sample_size"         => t.copy(neighborListSampleSize = v.trim.toInt)
        case "outlier_count"                     => t.copy(outlierCount = v.trim.toInt)
        case "top_speakers_count"                => t.copy(topSpeakersCount = v.trim.toInt)
        case _                                   => t
      }
    }

  /** Load `key = value` threshold overrides from a config file, with C18
    * `${VAR}` env interpolation; '#' starts a comment. */
  def loadThresholds(path: String, base: Thresholds = Thresholds()): Thresholds =
    thresholdsFrom(graft.core.Config.loadKeyValues(path), base)

  final case class Violation(name: String, expected: String, actual: String, severity: String)

  final case class Assessment(
      metrics: Map[String, Double],
      violations: Seq[Violation],
      ragStatus: String,
      /** Wall seconds per category block of [[assess]] — populated so a
        * bench-level regression in the composite number is localizable to
        * the category that moved (r6 postmortem: the one-number phase hid
        * a 2.8× swing). */
      timings: Map[String, Double] = Map.empty)

  // ---- Category A: coverage (coverage.py:19-279) --------------------

  /** Per-episode coverage: union span time / episode duration. Episode
    * duration comes from utterance extents (episodes frame:
    * episode_id, episode_duration). */
  def coverage(segments: DataFrame, episodes: DataFrame): DataFrame =
    Intervals.unionDuration(
        segments.select(col("episode_id"), col("start_time"), col("end_time")),
        Seq("episode_id"), "start_time", "end_time", unionCol = "union_s")
      .join(episodes, "episode_id")
      .withColumn("coverage_pct", lit(100.0) * col("union_s") / col("episode_duration"))

  /** A9 gaps between consecutive segments per episode. */
  def gapMetrics(segments: DataFrame): DataFrame =
    Intervals.withGapFromPrev(
        segments.select(col("episode_id"), col("start_time"), col("end_time")),
        Seq("episode_id"), "start_time", "end_time")
      .filter(col("_gap").isNotNull)
      .groupBy("episode_id")
      .agg(
        sum(when(col("_gap") > 0, col("_gap")).otherwise(0.0)).as("total_gap_s"),
        sum(when(col("_gap") < 0, -col("_gap")).otherwise(0.0)).as("total_overlap_s"),
        max(col("_gap")).as("max_gap_s"))

  // ---- Category B: distribution (distribution.py) -------------------

  def durationStats(segments: DataFrame): DataFrame =
    segments.agg(
      count(lit(1)).as("n"),
      min(col("duration")).as("min_s"),
      max(col("duration")).as("max_s"),
      avg(col("duration")).as("mean_s"),
      percentile(col("duration"), lit(0.05)).as("p05"),
      percentile(col("duration"), lit(0.5)).as("p50"),
      percentile(col("duration"), lit(0.95)).as("p95"),
      stddev_samp(col("duration")).as("std_s"))

  /** A5: % within [min,max] — forced to sum to 100.00 like the
    * reference (distribution.py:111-215). */
  def lengthCompliance(segments: DataFrame, minLen: Double, maxLen: Double): DataFrame =
    segments.agg(
      count(lit(1)).as("n"),
      round(lit(100.0) * sum(when(col("duration") >= minLen && col("duration") <= maxLen, 1)
        .otherwise(0)) / count(lit(1)), 2).as("within_pct"),
      round(lit(100.0) * sum(when(col("duration") < minLen, 1).otherwise(0)) / count(lit(1)), 2)
        .as("too_short_pct"),
      round(lit(100.0) * sum(when(col("duration") > maxLen, 1).otherwise(0)) / count(lit(1)), 2)
        .as("too_long_pct"))

  /** A6 fixed-edge histograms (span edges distribution.py:230; beat :231). */
  val SpanHistEdges = Seq(0.0, 20.0, 40.0, 60.0, 90.0, 120.0, 180.0)
  val BeatHistEdges = Seq(0.0, 60.0, 90.0, 120.0, 150.0, 180.0, 240.0)

  def durationHistogram(segments: DataFrame, edges: Seq[Double]): DataFrame =
    Stats.histogram(segments, col("duration"), edges).orderBy("bin_id")

  // ---- Category C: integrity (integrity.py) -------------------------

  /** A10 timestamp monotonicity: prev end > next start, per episode
    * (and per episode+speaker when `bySpeaker`). */
  def timestampRegressions(segments: DataFrame, bySpeaker: Boolean = false): DataFrame = {
    val parts = if (bySpeaker) Seq("episode_id", "speaker") else Seq("episode_id")
    val w = Window.partitionBy(parts.map(col): _*)
      .orderBy(col("start_time"), col("end_time"))
    segments
      .withColumn("_prev_end", lag(col("end_time"), 1).over(w))
      .filter(col("_prev_end").isNotNull && col("_prev_end") > col("start_time"))
  }

  /** A11 violation counters — the full reference counter set
    * (integrity.py:173-260 + checks.py:554-607 NaN/Inf), one row of
    * conditional aggregates in a single scan. Schema-aware: counters for
    * absent columns (e.g. `speaker` on beats) are omitted. */
  def integrityCounters(segments: DataFrame): DataFrame = {
    val cols = segments.columns.toSet
    val zero = sum(when(lit(false), 1L).otherwise(0L)) // typed 0 placeholder
    def cnt(cond: org.apache.spark.sql.Column) = sum(when(cond, 1L).otherwise(0L))
    val aggs = Seq(
      count(lit(1)).as("total_segments"),
      cnt(col("duration") < 0).as("negative_durations"),
      cnt(col("duration") === 0).as("zero_durations"),
      cnt(col("duration") <= 0).as("nonpositive_durations"),
      cnt(isnan(col("duration"))).as("nan_durations"),
      cnt(col("duration") === Double.PositiveInfinity ||
        col("duration") === Double.NegativeInfinity).as("inf_durations"),
      cnt(col("start_time").isNull || col("end_time").isNull).as("missing_timestamps"),
      cnt(col("start_time") > col("end_time")).as("inverted_timestamps"),
      cnt(col("start_time") < 0 || col("end_time") < 0).as("negative_timestamps"),
      cnt(col("episode_id").isNull || col("episode_id") === "").as("missing_episode")) ++
      (if (cols("speaker"))
        Seq(cnt(col("speaker").isNull || trim(col("speaker")) === "").as("missing_speaker"))
       else Seq(zero.as("missing_speaker"))) ++
      (if (cols("text"))
        Seq(cnt(col("text").isNull || col("text") === "").as("missing_text"))
       else Seq(zero.as("missing_text")))
    segments.agg(aggs.head, aggs.tail: _*)
  }

  /** A12 exact duplicates: normalized text + 5-min bin composite key
    * (integrity.py:379-549); returns (dup_groups, dup_rows, pct). */
  def exactDuplicates(segments: DataFrame, minLen: Int = 10): DataFrame = {
    val keyed = segments
      .withColumn("_norm", TF.normalizeWs(col("text")))
      .filter(length(col("_norm")) >= minLen)
      .withColumn("_bin", floor(col("start_time") / 300).cast("int"))
    val groups = keyed.groupBy("_norm", "episode_id", "speaker", "_bin")
      .agg(count(lit(1)).as("n"))
    groups.agg(
      coalesce(sum(col("n")), lit(0L)).as("n_rows"),
      coalesce(sum(when(col("n") > 1, 1L).otherwise(0L)), lit(0L)).as("dup_groups"),
      coalesce(sum(when(col("n") > 1, col("n")).otherwise(0L)), lit(0L)).as("dup_rows"))
      .withColumn("dup_pct",
        when(col("n_rows") > 0, lit(100.0) * col("dup_rows") / col("n_rows")).otherwise(0.0))
  }

  /** A13 near-duplicates at scale: MinHash-LSH instead of the O(n²)
    * rapidfuzz pass the reference guards at 10k rows. Carries the
    * default band-bucket cap — a boilerplate-heavy span corpus flags
    * its degenerate signatures instead of scoring them quadratically
    * ([[Dedup.minhashBucketAudit]] for the accounting). */
  def nearDuplicates(segments: DataFrame, idCol: String, threshold: Double = 0.8): DataFrame =
    Dedup.minhashNearDups(segments.select(col(idCol), col("text")), idCol,
      col("text"), shingleWords = 2, k = 12, bands = 4, threshold = threshold,
      maxBucket = Dedup.DefaultMaxBucket)

  // ---- Category D: balance (balance.py) -----------------------------

  /** A14 speaker distribution with top-N + long-tail rollup. The corpus
    * total is a 1-row broadcast and the top-N a distributed
    * TakeOrderedAndProject — not a global window, which would sort every
    * speaker in one task; the tail is everything the top-N anti-joins
    * away. */
  def speakerBalance(segments: DataFrame, topN: Int): DataFrame = {
    val bySpeaker = segments.groupBy("speaker")
      .agg(count(lit(1)).as("n"), sum(col("duration")).as("total_s"))
    val totals = broadcast(bySpeaker.agg(sum(col("n")).as("_total")))
    val withPct = bySpeaker.crossJoin(totals)
      .withColumn("pct", lit(100.0) * col("n") / col("_total"))
    val top = withPct.orderBy(col("n").desc, col("speaker")).limit(topN)
      .select("speaker", "n", "total_s", "pct")
    // null-SAFE anti join: a NULL speaker group that makes the top-N
    // would never match a plain key equality and get double-counted
    // into the tail (pct > 100%)
    val topKeys = top.select(col("speaker").as("_top_speaker"))
    val tail = withPct.join(topKeys,
        col("speaker") <=> col("_top_speaker"), "left_anti")
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        coalesce(sum(col("total_s")), lit(0.0)).as("total_s"),
        coalesce(sum(col("pct")), lit(0.0)).as("pct"))
      .withColumn("speaker", lit("<other>"))
      .select("speaker", "n", "total_s", "pct")
    top.unionByName(tail).filter(col("n") > 0)
  }

  // ---- Category E: text quality (text_quality.py) -------------------

  def textQuality(segments: DataFrame): DataFrame =
    segments
      .withColumn("_tok", TF.tokenCount(col("text")))
      .withColumn("_content", TF.contentTokenCount(col("text")))
      .withColumn("_punct", TF.punctRatio(col("text")))
      .agg(
        count(lit(1)).as("n"),
        sum(col("_tok")).as("total_tokens"),
        avg(col("_tok")).as("avg_tokens"),
        avg(length(col("text"))).as("avg_chars"),
        (sum(col("_content")).cast("double") / sum(col("_tok"))).as("lexical_density"),
        avg(col("_punct")).as("avg_punct_ratio"))

  // ---- Category F: embedding sanity (embedding.py) ------------------

  /** V8/V9: % of k-NN sharing the query's speaker / episode. Queries are
    * a deterministic sample (hash-ordered — V7's seeded-sample analog). */
  def neighborLeakage(spark: SparkSession, segments: DataFrame, embeddings: DataFrame,
      k: Int, sampleSize: Int): DataFrame = {
    val joined = segments
      .join(embeddings.select(col("artifact_id"), col("embedding")),
        segments("span_id") === col("artifact_id"))
      .select(col("span_id"), col("episode_id"), col("speaker"),
        VF.vecAsDouble(col("embedding")).as("v"))
      .cache()
    try {
      val queries = joined
        .withColumn("_h", xxhash64(col("span_id")))
        .orderBy("_h").limit(sampleSize)
        .select(col("span_id").as("query_id"), col("episode_id").as("q_ep"),
          col("speaker").as("q_spk"), col("v").as("qv"))
      val corpus = joined.select(col("span_id").as("neighbor_id"),
        col("episode_id").as("n_ep"), col("speaker").as("n_spk"), col("v").as("nv"))
      val knn = graft.operators.Similarity.topKExact(
        queries.select("query_id", "qv"), corpus.select("neighbor_id", "nv"), k)
      knn.join(queries, "query_id").join(corpus, "neighbor_id")
        .agg(
          (lit(100.0) * sum(when(col("q_spk") === col("n_spk"), 1).otherwise(0)) / count(lit(1)))
            .as("same_speaker_pct"),
          (lit(100.0) * sum(when(col("q_ep") === col("n_ep"), 1).otherwise(0)) / count(lit(1)))
            .as("same_episode_pct"))
        // 1-row result materialized eagerly so the cache can be released
        .localCheckpoint(true)
    } finally joined.unpersist()
  }

  // ---- Category G: diagnostics (diagnostics.py:20-156) --------------

  def durationOutliers(segments: DataFrame, idCol: String, k: Int): DataFrame = {
    val longest = segments.select(col(idCol), col("duration"))
      .orderBy(col("duration").desc, col(idCol)).limit(k)
      .withColumn("kind", lit("longest"))
    val shortest = segments.select(col(idCol), col("duration"))
      .orderBy(col("duration").asc, col(idCol)).limit(k)
      .withColumn("kind", lit("shortest"))
    longest.unionByName(shortest)
  }

  // ---- Assessment: thresholds + RAG (assessor.py:1040-1067) ---------

  /** Full assessment over spans/beats (+ optional embeddings for the
    * category-F checks).
    *
    * Scale shape: both inputs are CACHED for the duration (the reference
    * loads each table once, assessor.py:260-385 — without this every one
    * of the ~10 metric jobs would rescan the corpus from parquet), the
    * single-row span metrics (compliance + integrity counters) are FUSED
    * into one aggregation job, and all embedding checks share one sampled
    * k-NN job. Unpersist happens before returning. */
  def assess(spans: DataFrame, beats: DataFrame, episodes: DataFrame,
      t: Thresholds = Thresholds(),
      embeddings: Option[DataFrame] = None): Assessment = {
    val m = scala.collection.mutable.Map[String, Double]()
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      // categories now run concurrently — writes synchronized
      timings.synchronized { timings(name) = (System.nanoTime() - t0) / 1e9 }
      r
    }
    val sp = spans.cache()
    val bt = beats.cache()
    try {
      // The seven categories are INDEPENDENT jobs over the same two
      // cached inputs — run them from a small thread pool so the next
      // category's tasks back-fill executors freed by the current one's
      // stragglers (optimization guide §2.6: actions are only sequential
      // because driver code calls them sequentially). Each category's
      // own wall time is still recorded (now overlapping, so the
      // category map sums to MORE than the assessment wall — that is the
      // point). The caches are populated once, sequentially, BEFORE the
      // fan-out so the concurrent first actions don't race to compute
      // the same cache blocks. Parallelism 4: enough to overlap the
      // long categories (embedding/near_dup/coverage), not so many that
      // they fight for executor cores mid-stage.
      sp.count(); bt.count()
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      def timedF[A](name: String)(body: => A): Future[A] = Future {
        sp.sparkSession.sparkContext.setJobDescription(s"quality: $name")
        timed(name)(body)
      }

      // Submission order = longest-first (LPT): with a bounded pool the
      // longest categories (embedding k-NN, near-dup minhash, coverage
      // union) must start immediately or they become the tail.
      // category F first: all checks share ONE sampled k-NN job. An empty
      // neighbor frame (embeddings whose artifact_ids don't match the
      // spans — stale file, wrong artifact type) must SKIP the embedding
      // checks, not NPE on null aggregates or record bogus 0.0 metrics.
      val embF = timedF("embedding") { embeddings.flatMap { e =>
        val neigh = EmbeddingSanity.sampledNeighbors(
          sp, e, "span_id", t.neighborK, t.neighborSampleSize).cache()
        try {
          if (neigh.isEmpty) None
          else {
            // leakage + adjacency FUSED into one aggregation job over the
            // checkpointed neighbor frame (r16): same expressions as
            // EmbeddingSanity.leakagePcts / adjacencyBiasPct, one job
            // fewer of fixed scheduling latency
            val leak = neigh.agg(
              (lit(100.0) * sum(when(col("q_speaker") === col("n_speaker"), 1).otherwise(0))
                / count(lit(1))).as("same_speaker_pct"),
              (lit(100.0) * sum(when(col("q_episode_id") === col("n_episode_id"), 1).otherwise(0))
                / count(lit(1))).as("same_episode_pct"),
              (lit(100.0) * sum(when(
                  col("q_episode_id") === col("n_episode_id") &&
                  abs(col("q_start_time") - col("n_start_time")) <= t.adjacencyToleranceSeconds,
                  1).otherwise(0))
                / count(lit(1))).as("adjacency_bias_pct")).first()
            val bias = Option(EmbeddingSanity.lengthBiasCorr(neigh)
              .first().getAs[java.lang.Double]("length_bias_corr")).map(_.doubleValue())
            Some((leak.getAs[Double]("same_speaker_pct"), leak.getAs[Double]("same_episode_pct"),
              leak.getAs[Double]("adjacency_bias_pct"), bias))
          }
        } finally neigh.unpersist()
      } }

      // near-duplicates via MinHash-LSH at the reference's 0.95 bar;
      // % of spans that appear in at least one near-dup pair
      val nearDupIdsF = timedF("near_dup") {
        nearDuplicates(sp, "span_id", t.nearDuplicateThreshold)
          .select(explode(array(col("id_a"), col("id_b"))).as("id"))
          .distinct().count() }

      val covF = timedF("coverage") { coverage(sp, episodes)
        .agg(avg(col("coverage_pct"))).first().getDouble(0) }

      // corpus-level gap/overlap % of total episode time
      val gapsF = timedF("gaps") {
        val d = episodes.agg(coalesce(sum(col("episode_duration")), lit(0.0)))
          .first().getDouble(0)
        val g = gapMetrics(sp).agg(
          coalesce(sum(col("total_gap_s")), lit(0.0)).as("gap_s"),
          coalesce(sum(col("total_overlap_s")), lit(0.0)).as("overlap_s")).first()
        (d, g)
      }

      // integrity per level, NOT concatenated (assessor.py:617-679 bug-fix note)
      val integrityF = timedF("integrity") {
        (timestampRegressions(sp).count(),
          timestampRegressions(bt).count(),
          exactDuplicates(sp).first().getAs[Double]("dup_pct"))
      }

      // one fused aggregation job for every single-row span metric
      val spanRowF = timedF("distribution") { sp.agg(
        count(lit(1)).as("n"),
        round(lit(100.0) * sum(when(
          col("duration") >= t.spanLengthMin && col("duration") <= t.spanLengthMax, 1)
          .otherwise(0)) / count(lit(1)), 2).as("within_pct"),
        sum(when(col("duration") <= 0, 1L).otherwise(0L)).as("nonpositive_durations"))
        .first() }

      val beatComplianceF = timedF("beat_distribution") {
        lengthCompliance(bt, t.beatLengthMin, t.beatLengthMax)
          .first().getAs[Double]("within_pct") }

      def await[A](f: Future[A]): A =
        try Await.result(f, Duration.Inf)
        finally ()
      val (cov, (epDur, gaps), spanRow, beatCompliance,
          (spanRegr, beatRegr, spanDup), nearDupIds, emb) =
        try (await(covF), await(gapsF), await(spanRowF), await(beatComplianceF),
          await(integrityF), await(nearDupIdsF), await(embF))
        finally pool.shutdown()
      m("coverage_pct") = cov
      val gapPct = if (epDur > 0) 100.0 * gaps.getAs[Double]("gap_s") / epDur else 0.0
      val overlapPct = if (epDur > 0) 100.0 * gaps.getAs[Double]("overlap_s") / epDur else 0.0
      m("gap_pct") = gapPct
      m("overlap_pct") = overlapPct
      val nSpans = spanRow.getAs[Long]("n")
      val spanCompliance = spanRow.getAs[Double]("within_pct")
      val negDur = spanRow.getAs[Long]("nonpositive_durations")
      m("span_compliance_pct") = spanCompliance
      m("nonpositive_durations") = negDur.toDouble
      m("beat_compliance_pct") = beatCompliance
      m("span_regressions") = spanRegr.toDouble
      m("beat_regressions") = beatRegr.toDouble
      m("span_dup_pct") = spanDup
      val nearDupPct = if (nSpans > 0) 100.0 * nearDupIds / nSpans else 0.0
      m("near_dup_pct") = nearDupPct
      emb.foreach { case (spk, ep, adj, bias) =>
        m("same_speaker_pct") = spk
        m("same_episode_pct") = ep
        m("adjacency_bias_pct") = adj
        bias.foreach(b => m("length_bias_corr") = b)
      }

      val violations = Seq.newBuilder[Violation]
      def check(cond: Boolean, name: String, expected: String, actual: String,
          severity: String = "error"): Unit =
        if (!cond) violations += Violation(name, expected, actual, severity)

      check(cov >= t.coverageMin, "coverage_min", s">= ${t.coverageMin}", f"$cov%.2f")
      check(gapPct <= t.gapMaxPercent, "gap_max_percent",
        s"<= ${t.gapMaxPercent}", f"$gapPct%.2f", "warning")
      check(overlapPct <= t.overlapMaxPercent, "overlap_max_percent",
        s"<= ${t.overlapMaxPercent}", f"$overlapPct%.2f", "warning")
      check(spanCompliance >= t.spanComplianceMin, "span_length_compliance",
        s">= ${t.spanComplianceMin}", f"$spanCompliance%.2f", "warning")
      check(beatCompliance >= t.beatComplianceMin, "beat_length_compliance",
        s">= ${t.beatComplianceMin}", f"$beatCompliance%.2f", "warning")
      check(spanRegr <= t.timestampRegressionsMax, "timestamp_regressions",
        s"<= ${t.timestampRegressionsMax}", spanRegr.toString)
      check(beatRegr <= t.timestampRegressionsMax, "beat_timestamp_regressions",
        s"<= ${t.timestampRegressionsMax}", beatRegr.toString)
      check(negDur <= t.negativeDurationMax, "negative_durations",
        s"<= ${t.negativeDurationMax}", negDur.toString)
      check(spanDup <= t.exactDuplicateMaxPercent, "exact_duplicate_pct",
        s"<= ${t.exactDuplicateMaxPercent}", f"$spanDup%.2f")
      check(nearDupPct <= t.nearDuplicateMaxPercent, "near_duplicate_pct",
        s"<= ${t.nearDuplicateMaxPercent}", f"$nearDupPct%.2f", "warning")
      emb.foreach { case (spk, ep, adj, bias) =>
        check(spk <= t.sameSpeakerNeighborMaxPercent, "same_speaker_neighbor_pct",
          s"<= ${t.sameSpeakerNeighborMaxPercent}", f"$spk%.2f", "warning")
        check(ep <= t.sameEpisodeNeighborMaxPercent, "same_episode_neighbor_pct",
          s"<= ${t.sameEpisodeNeighborMaxPercent}", f"$ep%.2f", "warning")
        check(adj <= t.adjacencyBiasMaxPercent, "adjacency_bias_pct",
          s"<= ${t.adjacencyBiasMaxPercent}", f"$adj%.2f", "warning")
        bias.foreach(b =>
          check(math.abs(b) <= t.lengthBiasCorrelationMax, "length_bias_correlation",
            s"|corr| <= ${t.lengthBiasCorrelationMax}", f"$b%.4f", "warning"))
      }

      val vs = violations.result()
      // reporter.py:217-260: any error → RED; >2 warnings → RED;
      // 1-2 warnings → AMBER; else GREEN
      val nWarnings = vs.count(_.severity == "warning")
      val rag =
        if (vs.exists(_.severity == "error") || nWarnings > 2) "RED"
        else if (nWarnings > 0) "AMBER"
        else "GREEN"
      Assessment(m.toMap, vs, rag, timings.toMap)
    } finally {
      sp.unpersist()
      bt.unpersist()
    }
  }

  /** Markdown report (reporter.py:113-160 shape). */
  def renderMarkdown(a: Assessment): String = {
    val sb = new StringBuilder
    sb.append(s"# Quality Assessment\n\n**Status: ${a.ragStatus}**\n\n## Metrics\n\n")
    sb.append("| metric | value |\n|---|---|\n")
    a.metrics.toSeq.sortBy(_._1).foreach { case (k, v) =>
      sb.append(f"| $k | $v%.4f |\n")
    }
    sb.append("\n## Violations\n\n")
    if (a.violations.isEmpty) sb.append("None.\n")
    else {
      sb.append("| check | expected | actual | severity |\n|---|---|---|---|\n")
      a.violations.foreach { v =>
        sb.append(s"| ${v.name} | ${v.expected} | ${v.actual} | ${v.severity} |\n")
      }
    }
    sb.toString
  }
}
