package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Hashes, TextFunctions => TF}

/** Corpus-level training-data curation operators (beyond the reference's
  * surface; same family as `TextAnalysis`): benchmark decontamination,
  * curriculum sampling, domain-mixture reweighting, boilerplate n-gram
  * detection, TF-IDF keyword extraction, and token-budget sequence
  * packing. Every operator is a declarative DataFrame plan — per-doc work
  * stays map-side and codegen'd, corpus aggregates shuffle once on their
  * natural keys, and the small model-like frames (benchmark gram set,
  * boilerplate gram set, corpus totals) ride along as broadcasts.
  *
  * Cross-engine exactness (DuckDB oracles): averages are one double
  * division of exact parts (counts / DECIMAL sums), similarity-style
  * ratios round to 6 decimals, and every output ends in a total ORDER BY.
  */
object Corpus {

  /** Tokens column shared by all operators (whitespace split, empties
    * dropped — mirrors the oracle's `toksSql`). */
  private def toks: Column = TF.tokens(col("text"))

  /** Decimal-exact mean of a double column (order-independent). */
  private def dmean(c: Column): Column =
    sum(c.cast("decimal(20,12)")).cast("double") / count(lit(1))

  // ---- decontamination (q57) ----------------------------------------

  /** Benchmark-contamination check, the standard n-gram-overlap
    * decontamination step of LLM data pipelines (public method: GPT-3
    * appendix C / PaLM-style 'remove training docs sharing n-grams with
    * eval sets'). The benchmark here is the deterministic slice
    * `doc_id % benchMod == 0`; in production it would be a small fixed
    * eval corpus — which is why the distinct benchmark-gram set is
    * BROADCAST: it is bounded by benchmark size, not corpus size, so the
    * 100 TB side never shuffles (map-side semi-join + one (lang) agg).
    *
    * Per evaluated doc: fraction of its distinct word n-grams that occur
    * anywhere in the benchmark; a doc is contaminated when the fraction
    * reaches `contamFrac`. Output per lang: docs, contaminated docs,
    * mean / max overlap fraction.
    */
  def decontaminationStats(
      docs: DataFrame,
      benchMod: Int = 20,
      n: Int = 3,
      contamFrac: Double = 0.2): DataFrame = {
    // r15 shape: map-only probe. Each doc's distinct grams hash-sort once
    // (codegen kernel), the benchmark gram set collapses to ONE sorted
    // hash array broadcast to every task, and the per-doc overlap is a
    // binary-search membership count (O(|doc grams|·log |bench|)) — the
    // q27 langid exact-set-intersection device. Replaces the exploded
    // semi-join form, whose per-doc match counts shuffled on doc_id and
    // joined back onto the corpus (two corpus-wide exchanges); now the
    // only shuffle left is the final (lang) aggregation.
    graft.expressions.TextExprs.register(docs.sparkSession)
    graft.expressions.HashFunctions.register(docs.sparkSession)
    import graft.expressions.{HashFunctions => HF, TextExprs => TE}
    val base = docs
      .select(col("doc_id"), col("lang"), toks.as("tk"))
      .select(col("doc_id"), col("lang"),
        TE.distinct_word_ngrams(col("tk"), n).as("grams"))
    val isBench = pmod(col("doc_id"), lit(benchMod)) === 0

    // ONE aggregation, not distinct→collect_list (r16): collect_set's
    // partial buffers dedupe map-side, so the gram stream collapses to
    // one set per partition and a single exchange carries partial SETS
    // to the 1-row final merge — the old shape paid a full gram-keyed
    // exchange (distinct) before a second single-partition exchange.
    // xx_sorted_hash sorts, so the array is identical either way.
    val benchArr = base.filter(isBench)
      .select(explode(col("grams")).as("g"))
      .agg(TE.xx_sorted_hash(collect_set(col("g"))).as("_barr"))

    val perDoc = base.filter(!isBench)
      .select(col("doc_id"), col("lang"), size(col("grams")).as("n_grams"),
        TE.xx_sorted_hash(col("grams")).as("_gh"))
      .crossJoin(broadcast(benchArr))
      .withColumn("frac",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(HF.sorted_member_count(col("_gh"), col("_barr")).cast("double")
            / col("n_grams")))

    perDoc.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("frac") >= contamFrac, 1L).otherwise(0L)).as("n_contaminated"),
        round(dmean(col("frac")), 6).as("avg_overlap"),
        round(max(col("frac")), 6).as("max_overlap"))
      .orderBy("lang")
  }

  // ---- curriculum sampling (q58) ------------------------------------

  /** Quality-decile curriculum sampling: score every doc with the
    * deterministic heuristic quality score, split each language into
    * deciles (per-lang window — languages parallelize; within one
    * language a decile split is inherently a sort), then keep docs with
    * probability decile/10 via the SQL-replicable poly-hash of the doc id
    * (higher-quality deciles keep more — an upsample-the-best curriculum).
    * Deterministic end to end: same corpus → same kept set.
    */
  def curriculumDeciles(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("score"), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      .withColumn("decile", ntile(10).over(w))
      .withColumn("keep",
        pmod(Hashes.polyHash(col("doc_id").cast("string")), lit(10)) < col("decile"))
      .groupBy("lang", "decile")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        round(dmean(col("score")), 6).as("avg_score"))
      .orderBy("lang", "decile")
  }

  // ---- domain mixture (q59) -----------------------------------------

  /** Domain-mixture reweighting: actual per-source share vs a uniform
    * target, emitting a capped resampling weight and the planned
    * post-resample row count. The totals frame is one broadcast row —
    * no global window, no single-task stage.
    */
  def mixtureWeights(docs: DataFrame, cap: Double = 3.0): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val totals = broadcast(counts.agg(
      sum(col("n_docs")).as("_tot"), count(lit(1)).as("_nsrc")))
    counts.crossJoin(totals)
      .withColumn("share", col("n_docs").cast("double") / col("_tot"))
      .withColumn("weight",
        least(lit(cap), (lit(1.0) / col("_nsrc")) / col("share")))
      .select(
        col("source"), col("n_docs"),
        round(col("share") * 100, 6).as("share_pct"),
        round(col("weight"), 6).as("mix_weight"),
        floor(col("n_docs") * col("weight")).cast("long").as("planned_n"))
      .orderBy("source")
  }

  /** X93 temperature-scaled mixture: p_i ∝ n_i^α, the standard
    * multi-corpus sampling temperature (T5's examples-proportional
    * mixing with a rate exponent; LLaMA-style corpus reweighting).
    * α < 1 upsamples small sources without the hard uniform target of
    * [[mixtureWeights]]. This audit fixes α = 1/2 and computes n^α via
    * `sqrt` — correctly rounded in IEEE 754, so the oracle matches
    * bit-for-bit where a libm `pow` could drift in the last ulp; the
    * production path generalizes α with `pow` and unit-gates instead.
    * Same scale shape as mixtureWeights: per-source agg, one broadcast
    * totals row, no global window. */
  /** X101 class-balanced downsample: keep at most `cap` rows per class,
    * selected by a DETERMINISTIC arithmetic shuffle key — Knuth's
    * multiplicative hash `(pmod(id, 2³¹) · 2654435761) mod 2^32`,
    * tie-broken by id. Pure 64-bit integer arithmetic means any SQL
    * engine reproduces the exact selection (the audit is hash-oracled
    * down to WHICH rows were kept, via the kept-id checksum), unlike
    * engine-specific hash functions. The id folds through `pmod(·, 2³¹)`
    * BEFORE the multiply so the product is bounded by
    * (2³¹−1)·2654435761 ≈ 5.7×10¹⁸ < 2⁶³−1 for EVERY long id — without
    * the fold, ids past 2⁶³/2654435761 ≈ 3.47×10⁹ silently wrap in
    * Spark but raise on BIGINT overflow in DuckDB, an engine-dependent
    * selection. For ids under 2³¹ the fold is the identity, so the key
    * (and the kept set) is unchanged from the unfolded formulation.
    *
    * Scale shape: per-class selection runs through the bounded-heap
    * `topk_min` aggregate — map-side partials keep ≤ cap rows per class
    * per partition, so the class-keyed shuffle carries ≤ cap·partitions
    * rows and a giant class never window-sorts. Returns one audit row
    * per class: (class, n_before, n_kept, kept_id_sum). A NULL class is
    * one group, like SQL GROUP BY — the audit join is null-safe (`<=>`)
    * so those rows are counted, not silently dropped. The kept ids
    * themselves come from [[balancedSampleRows]]. */
  def balancedSample(df: DataFrame, idCol: String, classCol: Column,
      cap: Int): DataFrame = {
    val kept = balancedSampleRows(df, idCol, classCol, cap)
      .groupBy(col("_cls"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        sum(col(idCol)).cast("long").as("kept_id_sum"))
    val before = df.groupBy(classCol.as("_cls"))
      .agg(count(lit(1)).cast("long").as("n_before"))
    before.join(kept, before("_cls") <=> kept("_cls"))
      .select(before("_cls").as("class"), col("n_before"), col("n_kept"),
        col("kept_id_sum"))
      .orderBy("class")
  }

  /** The selected (class, id) rows behind [[balancedSample]]. */
  def balancedSampleRows(df: DataFrame, idCol: String, classCol: Column,
      cap: Int): DataFrame = {
    require(cap > 0, s"balancedSample: cap must be positive, got $cap")
    // widening-safe Knuth key: fold into [0, 2^31) first (see Scaladoc)
    val key = pmod(pmod(col(idCol), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
    df.select(classCol.as("_cls"), col(idCol))
      .groupBy("_cls")
      .agg(graft.expressions.TopKMin.topkMin(
        struct(key.as("k"), col(idCol).as("id")), cap).as("_tk"))
      .select(col("_cls"), explode(col("_tk")).as("_e"))
      .select(col("_cls"), col("_e.id").as(idCol))
  }

  /** X109 UniMax epoch-capped mixture allocation (public method: Chung
    * et al. 2023, "UniMax: Fairer and More Effective Language Sampling" —
    * the budget water-filling that replaces temperature sampling in
    * large-scale multilingual pretraining). Given a token budget
    * (`budgetFrac` × corpus tokens) and a repetition ceiling
    * (`maxEpochs`), allocate the budget as uniformly as possible without
    * any source exceeding `maxEpochs` passes over its data: sources
    * whose cap `n_s·maxEpochs` sits below the water level get their cap
    * ("bound"); the rest split the remainder evenly.
    *
    * Closed form, no iteration: with caps sorted ascending,
    * f(r) = Σ_{i≤r} cap_i + cap_r·(S−r) is non-decreasing, so
    * "f(r) ≤ budget" marks exactly the bound prefix per-row — one window
    * pass plus one conditional aggregate recovers the water level
    * u = (budget − Σ_bound cap)/(S − #bound). All comparisons run in
    * exact DECIMAL; u is the single double division (cross-engine
    * identical), rounded to 6.
    *
    * Scale shape: the ONLY corpus-sized work is the source-keyed token
    * sum (map-side combined). Everything after runs on the aggregated
    * S-row table — the unpartitioned window is a deliberate single task
    * over #sources rows (bounded: languages/domains, thousands at most),
    * and the two one-row total frames ride along as broadcasts. */
  def unimaxAllocation(docs: DataFrame, sourceCol: Column, tokenCol: Column,
      budgetFrac: Double, maxEpochs: Double): DataFrame = {
    require(budgetFrac > 0 && maxEpochs > 0, "budgetFrac and maxEpochs must be positive")
    val me = lit(maxEpochs).cast("decimal(8,4)")
    val bf = lit(budgetFrac).cast("decimal(8,4)")
    val counts = docs.groupBy(sourceCol.as("source"))
      .agg(sum(tokenCol.cast("long")).as("n_tokens"))
    val capped = counts.withColumn("cap",
      (col("n_tokens").cast("decimal(20,4)") * me).cast("decimal(24,4)"))
    val tot = counts.agg(
      (sum(col("n_tokens")).cast("decimal(24,4)") * bf).cast("decimal(28,4)").as("_budget"),
      count(lit(1)).as("_s"))
    val w = Window.orderBy(col("cap"), col("source"))
    val ranked = capped
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("pfx", sum(col("cap"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
      .withColumn("bound",
        col("pfx") + col("cap") * (col("_s") - col("rk")) <= col("_budget"))
    val lvl = ranked.agg(
      coalesce(sum(when(col("bound"), col("cap"))), lit(0).cast("decimal(24,4)")).as("_bp"),
      sum(when(col("bound"), 1L).otherwise(0L)).as("_j"))
    ranked.crossJoin(broadcast(lvl))
      .withColumn("alloc_tokens",
        when(col("bound"), col("cap").cast("double"))
          .otherwise(round((col("_budget") - col("_bp")).cast("double")
            / (col("_s") - col("_j")), 6)))
      .withColumn("epochs",
        when(col("n_tokens") > 0,
          round(col("alloc_tokens") / col("n_tokens"), 6)).otherwise(lit(0.0)))
      .select("source", "n_tokens", "bound", "alloc_tokens", "epochs")
      .orderBy("source")
  }

  def temperatureMixture(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("scaled", sqrt(col("n_docs").cast("double")))
    val totals = broadcast(counts.agg(
      sum(col("n_docs")).as("_tot"),
      sum(col("scaled").cast("decimal(28,12)")).as("_stot")))
    counts.crossJoin(totals)
      .withColumn("raw_share", col("n_docs").cast("double") / col("_tot"))
      .withColumn("temp_share", col("scaled") / col("_stot").cast("double"))
      .select(
        col("source"), col("n_docs"),
        round(col("raw_share") * 100, 6).as("raw_share_pct"),
        round(col("temp_share") * 100, 6).as("temp_share_pct"),
        round(col("temp_share") / col("raw_share"), 6).as("upsample_factor"))
      .orderBy("source")
  }

  /** APPLY form of [[curriculumDeciles]]: the kept rows themselves.
    * Same deterministic rule (poly-hash of doc_id < decile), so the kept
    * set is exactly the one the stats query counts. */
  /** The decile fit is EXACT ntile by mandate (r12 decision): Spark's
    * `percentile_approx` GK sketch is not bit-replicable in other
    * engines, and the cross-engine oracle is this library's correctness
    * backbone — so the fit stays an exact per-language sort, but over a
    * PROJECTED (lang, score, doc_id) frame: the one-reducer-per-language
    * ntile stage carries ~20 bytes/row instead of document text (at
    * 100 TB that is the difference between one reducer sorting a few GB
    * of keys and one reducer sorting the corpus), and the kept ids
    * semi-join back as a normal parallel shuffle. */
  def applyCurriculum(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("score"), col("doc_id"))
    val keep = docs
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScore(col("text")).as("score"))
      .withColumn("decile", ntile(10).over(w))
      .filter(pmod(Hashes.polyHash(col("doc_id").cast("string")), lit(10)) < col("decile"))
      .select("doc_id")
    docs.join(keep, Seq("doc_id"), "left_semi")
  }

  /** APPLY form of [[mixtureWeights]]: deterministically resample each
    * source to ~weight× its rows — floor(w) whole copies per row plus one
    * extra copy gated on a per-row hash against the fractional part.
    * Distributed as an explode over a bounded copy sequence (weights are
    * capped); expected output per source = n·w exactly, realized output
    * deterministic for a fixed corpus. */
  def applyMixture(docs: DataFrame, cap: Double = 3.0): DataFrame = {
    val weights = mixtureWeights(docs, cap)
      .select(col("source"), (col("mix_weight")).as("w"))
    val maxCopies = math.ceil(cap).toInt
    docs.join(broadcast(weights), "source")
      // same w == 0.0 guard as applyUnimax (sequence(1,0) = [1,0])
      .withColumn("_copy", explode(sequence(lit(1), greatest(least(
        ceil(col("w")).cast("int"), lit(maxCopies)), lit(1)))))
      .withColumn("_frac", col("w") - floor(col("w")))
      // copies 1..floor(w) always survive; the ceil(w)-th copy survives
      // with probability frac via a uniform-ish hash in [0,1)
      .filter(col("_copy") <= floor(col("w")) ||
        (pmod(Hashes.polyHash(concat_ws("#", col("doc_id").cast("string"),
          col("_copy").cast("string"))), lit(1000003L)).cast("double") / 1000003.0)
          < col("_frac"))
      .drop("_copy", "_frac", "w")
  }

  /** APPLY form of [[unimaxAllocation]]: resample each source to its
    * allocated epoch count e — floor(e) whole copies of every doc plus
    * the ceil(e)-th copy gated on a per-(doc, copy) hash against the
    * fractional part (the [[applyMixture]] device with the UniMax
    * allocation as the weight; e < 1 downsamples, e > 1 upsamples).
    * Adds a 1-based `copy` column. Deterministic: same corpus → same
    * multiset of rows. Scale shape: the allocation table is one row per
    * source (broadcast); the corpus pays a map-side join + a bounded
    * explode (≤ ⌈maxEpochs⌉ copies). */
  def applyUnimax(docs: DataFrame, tokenCol: Column, budgetFrac: Double,
      maxEpochs: Double): DataFrame = {
    val alloc = unimaxAllocation(docs, col("source"), tokenCol, budgetFrac, maxEpochs)
      .select(col("source"), col("epochs").as("_e"))
    val maxCopies = math.ceil(maxEpochs).toInt
    docs.join(broadcast(alloc), "source")
      // greatest(...,1) guards e == 0.0: sequence(1, 0) in Spark is the
      // DESCENDING [1, 0], and the copy=0 row would pass copy<=floor(0);
      // with the guard the lone copy=1 row fails both keep conditions,
      // matching the oracle's empty range (and incrementalStages)
      .withColumn("copy", explode(sequence(lit(1), greatest(
        least(ceil(col("_e")).cast("int"), lit(maxCopies)), lit(1)))))
      .filter(col("copy") <= floor(col("_e")) ||
        (pmod(Hashes.polyHash(concat_ws("#", col("doc_id").cast("string"),
          col("copy").cast("string"))), lit(1000003L)).cast("double") / 1000003.0)
          < col("_e") - floor(col("_e")))
      .drop("_e")
  }

  // ---- boilerplate (q60) --------------------------------------------

  /** Boilerplate n-gram detection (C4-style, public method: Raffel et
    * al. 2020 filter repeated boilerplate lines; our synthetic docs have
    * no line structure, so the unit is the word n-gram). A gram is
    * boilerplate when it appears in more than `dfFrac` of all docs; a doc
    * is flagged when more than `docFlagFrac` of its gram occurrences are
    * boilerplate. The boilerplate set is bounded (df > 25% of corpus ⇒ at
    * most 1/dfFrac · distinct grams can qualify — in practice a handful),
    * so it broadcasts; the corpus side sees one distinct + two keyed aggs.
    * Docs with fewer than n tokens have no grams and are excluded (the
    * oracle mirrors this).
    */
  def boilerplateStats(
      docs: DataFrame,
      n: Int = 2,
      dfFrac: Double = 0.25,
      docFlagFrac: Double = 0.5): DataFrame = {
    val grams = docs
      .select(col("doc_id"), col("lang"), toks.as("tk"))
      .select(col("doc_id"), col("lang"),
        explode(TF.wordShinglesOfTokens(col("tk"), n)).as("g"))

    val nDocs = broadcast(docs.agg(count(lit(1)).as("_ndocs")))
    val boiler = grams.select("doc_id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("df"))
      .crossJoin(nDocs)
      .filter(col("df") > lit(dfFrac) * col("_ndocs"))
      .select("g")

    val perDoc = grams
      .join(broadcast(boiler.withColumn("_b", lit(1))), Seq("g"), "left")
      .groupBy("doc_id", "lang")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("_b"), lit(0))).as("n_boiler"))
      .withColumn("ratio", col("n_boiler").cast("double") / col("n_grams"))

    perDoc.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(dmean(col("ratio")), 6).as("avg_boiler_ratio"),
        sum(when(col("ratio") > docFlagFrac, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy("lang")
  }

  // ---- TF-IDF (q61) -------------------------------------------------

  /** Top-k TF-IDF terms per language over content (non-stopword) tokens:
    * tf = corpus-wide occurrences within the language, idf = ln(langDocs
    * / docFreq). Document frequency comes from a distinct + keyed count
    * (two narrow aggs) instead of count_distinct, so no Expand doubles
    * the exploded token stream. Ranking rounds FIRST (6 dp) and
    * tie-breaks on the term so the order is cross-engine total.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    // ONE scan: per-(lang, term, doc) counts first (partial-agg shrinks
    // the exploded stream map-side), then tf = Σcounts and df = #docs in
    // a second narrow agg — no second documents scan, no tf⋈df join, no
    // count_distinct Expand
    val perDoc = docs
      .select(col("doc_id"), col("lang"), explode(TF.contentTokens(col("text"))).as("term"))
      .groupBy("lang", "term", "doc_id").agg(count(lit(1)).as("c"))
    val tfdf = perDoc.groupBy("lang", "term")
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
    val langDocs = docs.groupBy("lang").agg(count(lit(1)).as("n_lang_docs"))

    val scored = tfdf
      .join(broadcast(langDocs), Seq("lang"))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_lang_docs").cast("double") / col("df")), 6))

    val w = Window.partitionBy("lang").orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("lang", "rnk", "term", "tf", "df", "tfidf")
      .orderBy("lang", "rnk")
  }

  // ---- source analytics (q69-q71, q75-q76) --------------------------

  /** Per-source duplication rate — the "which domain is spammy" signal:
    * exact-dup keyed on the normalized-text poly-hash, distinct+count
    * per source (no Expand). */
  def sourceDupRates(docs: DataFrame): DataFrame = {
    val hashed = docs.select(col("source"),
      Hashes.polyHash(TF.normalizeWs(col("text"))).as("h"))
    val nDocs = hashed.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val nDistinct = hashed.distinct()
      .groupBy("source").agg(count(lit(1)).as("n_distinct"))
    nDocs.join(nDistinct, "source")
      .withColumn("dup_rate",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_docs"), 6))
      .orderBy("source")
  }

  /** Identical normalized content under more than one language label —
    * a labeling-quality red flag. */
  def crossLangContent(docs: DataFrame): DataFrame = {
    val pairs = docs.select(
      Hashes.polyHash(TF.normalizeWs(col("text"))).as("h"), col("lang"))
      .distinct()
    pairs.groupBy("h").agg(count(lit(1)).as("n_langs"))
      .groupBy("n_langs").agg(count(lit(1)).as("n_contents"))
      .orderBy("n_langs")
  }

  /** Type-token ratio per source: corpus-level lexical diversity (the
    * curation signal that catches template-generated or looping spam
    * even when per-doc stats look fine). distinct+count, one scan. */
  def typeTokenRatio(docs: DataFrame): DataFrame = {
    val toksExploded = docs.select(col("source"), explode(toks).as("tok"))
    val totals = toksExploded.groupBy("source").agg(count(lit(1)).as("n_tokens"))
    val types = toksExploded.distinct()
      .groupBy("source").agg(count(lit(1)).as("n_types"))
    totals.join(types, "source")
      .withColumn("ttr", round(col("n_types").cast("double") / col("n_tokens"), 6))
      .orderBy("source")
  }

  /** X124 token-distribution divergence audit per source: KL(source ‖
    * corpus) over the unigram distribution, token-level Shannon entropy,
    * and Simpson concentration Σp² (1/Σp² = effective vocabulary size).
    * The domain-shift triple a mixture planner reads before weighting
    * sources: KL says how far a source's language sits from the corpus
    * mean, entropy/Simpson say whether the source is diverse or a
    * handful of tokens wearing a long tail — signals the per-doc quality
    * ops (X78/X119/X123) cannot see because they never compare
    * DISTRIBUTIONS across sources.
    *
    * Scale shape: the one corpus-sized shuffle is the (source, token)
    * count; source totals AND corpus token counts both fold from that
    * already-aggregated table (no second corpus pass — the q114 device);
    * the scoring join runs on vocabulary-sized frames keyed by token
    * with `shuffle_hash` (corpus-scale vocabularies are past broadcast
    * range); the corpus total rides as a 1-row broadcast. All
    * parity-sensitive arithmetic follows the established order-free
    * contract: ln rounds to 6dp before products, terms to 12dp into
    * DECIMAL sums. KL is well-defined with no smoothing because q(t) > 0
    * for every token the source contains (the corpus includes the
    * source). */
  def tokenDivergence(docs: DataFrame): DataFrame = {
    val st = docs.select(col("source"), explode(toks).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("n_st"))
    val srcTot = st.groupBy("source").agg(sum(col("n_st")).as("n_s"))
    val corpus = st.groupBy("tok").agg(sum(col("n_st")).as("n_t"))
    val corpusTot = corpus.agg(sum(col("n_t")).as("n"))
    val p = col("n_st").cast("double") / col("n_s")
    val q = col("n_t").cast("double") / col("n")
    val scored = st.join(srcTot, "source")
      .join(corpus.hint("shuffle_hash"), "tok")
      .crossJoin(broadcast(corpusTot))
      .select(col("source"),
        round(p * round(log(p / q), 6), 12).cast("decimal(20,14)").as("_kl"),
        round(p * round(log(p), 6), 12).cast("decimal(20,14)").as("_h"),
        round(p * p, 12).cast("decimal(20,14)").as("_sq"))
    scored.groupBy("source").agg(
      count(lit(1)).as("n_types"),
      round(sum(col("_kl")).cast("double"), 6).as("kl_vs_corpus"),
      round(-sum(col("_h")).cast("double"), 6).as("token_entropy"),
      round(sum(col("_sq")).cast("double"), 6).as("simpson"))
      .orderBy("source")
  }

  /** X126 per-source length-distribution divergence: a decile-grid
    * Kolmogorov–Smirnov statistic — max over the corpus's nine exact
    * length deciles of |CDF_source − CDF_corpus|. q35's length-bias check
    * compares MEANS; a source can match the corpus mean while being
    * bimodal (half stubs, half walls of text — exactly what chunking
    * bugs and boilerplate injection produce), which only a
    * distribution-level comparison sees.
    *
    * Scale shape: the decile boundaries are ONE exact-percentile agg
    * collected to the driver (nine doubles — a bounded model object, the
    * IVF-trainer device; `Stats.pct` documents the `approx_percentile`
    * escape hatch where exact percentiles stop being affordable); both
    * CDFs then evaluate as conditional sums inside ordinary aggs — the
    * per-source one and a 1-row corpus one that rides as a broadcast.
    * The KS max is a 9-term `greatest` — closed form, order-free. */
  def lengthDivergence(docs: DataFrame): DataFrame = {
    val ps = (1 to 9).map(_ / 10.0)
    val bounds = docs
      .agg(percentile(col("n_chars"), typedlit(ps)).as("qs"))
      .first().getSeq[Double](0)
    def cdfSums(prefix: String): Seq[Column] = bounds.zipWithIndex.map {
      case (b, i) =>
        sum(when(col("n_chars") <= b, 1L).otherwise(0L)).as(s"_$prefix$i")
    }
    val totAggs = cdfSums("t")
    val tot = docs.agg(count(lit(1)).as("_n"), totAggs: _*)
    val srcAggs = cdfSums("s")
    val src = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), srcAggs: _*)
    val terms = bounds.indices.map(i =>
      abs(col(s"_s$i").cast("double") / col("n_docs") -
        col(s"_t$i").cast("double") / col("_n")))
    src.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        round(greatest(terms: _*), 6).as("ks_stat"))
      .orderBy("source")
  }

  /** Bigram novelty per source: the fraction of a source's distinct
    * bigrams that appear in NO other source — high novelty means the
    * source adds variety, near-zero means it restates the corpus. One
    * exploded distinct, one bigram-keyed count, one broadcast-light join
    * back (the distinct-bigram frame is vocabulary-sized). */
  def sourceNovelty(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(col("source"), toks.as("tk"))
      .select(col("source"), explode(TF.wordShinglesOfTokens(col("tk"), 2)).as("g"))
      .distinct()
    val spread = grams.groupBy("g").agg(count(lit(1)).as("n_sources"))
    grams.join(spread, "g")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_bigrams"), 6))
      .orderBy("source")
  }

  /** X92 pairwise source-overlap matrix: exact Jaccard between the
    * distinct word-bigram vocabularies of every source pair — the
    * corpus-mixing planner's view of how much two slices share
    * ([[sourceNovelty]] is this measure's unary form; cross-source
    * contamination becomes visible BEFORE two corpora are blended).
    * Pairs with zero shared grams still appear (full upper-triangle
    * grid), so a disjoint pair reads 0.0, not absent.
    *
    * Shape: the distinct (source, gram) frame is checkpointed once and
    * reused three times (sizes + both self-join sides); the self-join is
    * gram-keyed and hinted `shuffle_hash` (the gram key is the
    * parallelism mechanism — a broadcast would collapse it). A gram in s
    * sources fans out to C(s,2) pair rows: bounded by S² per gram, and S
    * (distinct sources) is orders below the row count. For corpora with
    * thousands of sources, route through [[Dedup.signatureFromHashes]]
    * per source (k slots per source, estimate = matching-slot fraction)
    * instead of the exact join. */
  def sourceOverlap(docs: DataFrame, n: Int = 2): DataFrame = {
    val grams = docs
      .select(col("source"), toks.as("tk"))
      .select(col("source"), explode(TF.wordShinglesOfTokens(col("tk"), n)).as("g"))
      .distinct()
      .localCheckpoint(false)
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("n"))
    val inter = grams.select(col("source").as("source_a"), col("g"))
      .hint("shuffle_hash")
      .join(grams.select(col("source").as("source_b"), col("g")), "g")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_common"))
    sizes.select(col("source").as("source_a"), col("n").as("n_a"))
      .crossJoin(sizes.select(col("source").as("source_b"), col("n").as("n_b")))
      .filter(col("source_a") < col("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("n_common"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  // ---- sequence packing (q62) ---------------------------------------

  /** Token-budget sequence-packing statistics: docs are laid out in
    * doc_id order per language and cut into packs of `budget` tokens by
    * the sequential rule pack = floor(tokensBefore / budget) — the doc
    * that crosses a boundary belongs to the pack where it started (the
    * deterministic 'concat-then-chunk' layout used to build LLM training
    * sequences). Per language: pack count, mean docs per pack, mean fill
    * ratio, largest pack. The per-lang running sum is a sort within each
    * language; languages parallelize (at larger scale, pre-aggregated
    * shard offsets would replace the single-key window — noted, not
    * needed at bench scale).
    */
  /** The doc → pack layout itself (lang, doc_id, ntok, pack) — feed this
    * to a writer to materialize training sequences; [[packingStats]] is
    * its audit view. */
  def packAssignments(docs: DataFrame, budget: Int = 512): DataFrame = {
    val w = Window.partitionBy("lang").orderBy("doc_id")
    docs
      .select(col("lang"), col("doc_id"), TF.tokenCount(col("text")).as("ntok"))
      .withColumn("cum", sum(col("ntok")).over(w))
      .withColumn("pack",
        floor((col("cum") - col("ntok")).cast("double") / budget).cast("long"))
      .drop("cum")
  }

  /** X90 first-fit-decreasing bin packing — the HARD-CAP packing
    * contract beside [[packAssignments]]' concat-then-chunk layout:
    * every doc stays whole AND no pack exceeds `budget` (oversize docs
    * get a singleton pack), waste within the classic FFD 11/9·OPT+6/9
    * bound of optimal (Johnson's bound, public).
    *
    * Packing is inherently sequential, so it runs per PARTITION via
    * mapPartitions (the same sanctioned imperative seam as the
    * Misra–Gries sketch): each partition sorts its docs by (ntok desc,
    * doc_id) and folds them through a first-fit scan; partitions pack
    * independently and in parallel, so pack ids are (partition, local)
    * pairs and the operator scales horizontally — a global FFD would
    * serialize the corpus through one node for a fill gain that
    * vanishes at thousands of docs per partition. Deterministic for a
    * fixed partitioning (the caller pre-partitions by a stable key,
    * e.g. lang, when reproducible packs matter).
    * Returns (doc_id, ntok, pack_part, pack_local). */
  def packFirstFitDecreasing(docs: DataFrame, budget: Int = 512): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), TF.tokenCount(col("text")).cast("long").as("ntok"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        // the sort (the D in FFD) inherently buffers the partition; the
        // FIT scan must not add an O(P) factor on top — FirstFitTree
        // finds the leftmost fitting pack in O(log P), so a fat
        // partition of short docs (P ~ n) costs O(n log n), not O(n²)
        val ds = it.toArray.sortBy { case (id, n) => (-n, id) }
        val ff = new FirstFitTree(budget.toLong)
        ds.iterator.map { case (id, n) => (id, n, part, ff.place(n)) }
      }
      .toDF("doc_id", "ntok", "pack_part", "pack_local")
  }

  /** Leftmost-first-fit in O(log P): a growable segment tree over pack
    * slots keyed by REMAINING capacity (internal nodes hold the subtree
    * max). Every slot starts at full `budget`, so "open a new pack" is
    * just placing into the leftmost untouched slot — which is exactly
    * what plain first-fit does, making this a drop-in replacement for
    * the linear scan with identical output (the tree descends to the
    * MINIMUM index whose remaining >= n; untouched slots form a suffix,
    * so the first untouched slot is reached exactly when no opened pack
    * fits). Oversize docs (n > budget) get the next fresh slot as a
    * singleton pack — its remaining goes negative and never fits
    * anything again, same as the linear version. Pure JVM, unit-tested
    * against a reference linear scan in CorpusSpec. */
  private[operators] final class FirstFitTree(budget: Long) {
    private var nLeaves = 1024
    private var tree = Array.fill(2 * nLeaves)(budget)
    private var opened = 0
    def nOpened: Int = opened

    private def grow(): Unit = {
      val old = tree; val oldLeaves = nLeaves
      nLeaves <<= 1
      tree = Array.fill(2 * nLeaves)(budget)
      System.arraycopy(old, oldLeaves, tree, nLeaves, oldLeaves)
      var i = nLeaves - 1
      while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i -= 1 }
    }

    /** Place a doc of `n` tokens; returns its pack index. */
    def place(n: Long): Int = {
      val idx =
        if (n > budget) { if (opened >= nLeaves) grow(); opened }
        else {
          if (tree(1) < n) grow() // only possible when every slot is used
          var node = 1
          while (node < nLeaves)
            node = if (tree(2 * node) >= n) 2 * node else 2 * node + 1
          node - nLeaves
        }
      if (idx >= opened) opened = idx + 1
      var node = idx + nLeaves
      tree(node) -= n
      node >>= 1
      while (node >= 1) {
        tree(node) = math.max(tree(2 * node), tree(2 * node + 1)); node >>= 1
      }
      idx
    }
  }

  // ---- LM-based selection scoring (q82, q83) ------------------------

  /** X78 fluency scoring with a self-trained unigram LM (the public
    * CCNet / Wikipedia-LM perplexity-filter recipe, reduced to unigrams
    * so the model is exactly recomputable by the SQL oracle): every
    * token's negative log-likelihood under add-one smoothing over the
    * corpus vocabulary, averaged per document, then summarized per
    * source. The LM is a vocabulary-sized frame — bounded model state —
    * and rides to the scoring join on the token key; per-doc scores
    * reduce on doc_id, the report on source. No global window anywhere.
    *
    * Exactness: per-token NLL rounds to 6 dp before any cross-row sum,
    * per-doc sums go through DECIMAL(20,12) (order-independent), the
    * per-doc mean is one double division of exact parts, and the
    * source-level mean re-rounds the doc score to 6 dp first so both
    * engines aggregate identical doubles. */
  def perplexityBuckets(docs: DataFrame): DataFrame = {
    val tk = docs.select(col("doc_id"), col("source"), explode(toks).as("tok"))
    val counts = tk.groupBy("tok").agg(count(lit(1)).as("nw"))
    val tot = counts.agg(sum(col("nw")).as("n_tokens"), count(lit(1)).as("v"))
    val lm = counts.crossJoin(broadcast(tot))
      .select(col("tok"),
        round(-log((col("nw") + lit(1)).cast("double") /
          (col("n_tokens") + col("v"))), 6).as("nll"))
    val perDoc = tk.join(lm, "tok")
      .groupBy("doc_id", "source")
      .agg(
        (sum(col("nll").cast("decimal(20,12)")).cast("double") / count(lit(1)))
          .as("score"))
    perDoc.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(dmean(round(col("score"), 6)), 6).as("avg_nll"),
        round(min(col("score")), 6).as("min_nll"),
        round(max(col("score")), 6).as("max_nll"))
      .orderBy("source")
  }

  /** X119 bigram-LM cross-entropy per source (the second-order extension
    * of X78 — the public KenLM/CCNet filter recipe actually conditions on
    * context, and a bigram model is the smallest LM that does): every
    * adjacent token pair scores −ln p(w₂|w₁) under add-one smoothing
    * (p = (c(w₁w₂)+1)/(c(w₁·)+V), V = corpus unigram vocabulary),
    * averaged per document, summarized per source. Templated/synthetic
    * sources read LOW (their continuations are predictable) even when
    * their unigram mix looks natural — exactly the signal the unigram
    * model cannot see.
    *
    * Scale shape: bigrams explode map-only from the token array (the
    * X25 sequence/element_at device — no per-doc window sort); the
    * bigram count is the one corpus-sized gram-keyed shuffle; context
    * counts c(w₁·) fold from the ALREADY-AGGREGATED bigram table (no
    * second corpus pass); the vocabulary count is one distinct over
    * tokens; scoring joins the bigram stream to the vocab-sized LM on
    * the gram key with `shuffle_hash` — at crawl scale the bigram vocab
    * is far past broadcast range and sort-merge would sort the corpus
    * stream for a join that hashing serves in one pass (the X113
    * rationale). Per-doc and per-source reductions mirror X78's DECIMAL
    * exactness contract. Docs with < 2 tokens have no bigrams and drop
    * from the report on both engines (JOIN semantics, documented). */
  def bigramPerplexity(docs: DataFrame): DataFrame = {
    val tkArr = docs.select(col("doc_id"), col("source"), toks.as("_tk"))
      .filter(size(col("_tk")) >= 2)
    val bg = tkArr.select(col("doc_id"), col("source"),
      explode(transform(sequence(lit(0), size(col("_tk")) - 2),
        i => struct(element_at(col("_tk"), i + 1).as("w1"),
          element_at(col("_tk"), i + 2).as("w2")))).as("_bg"))
      .select(col("doc_id"), col("source"),
        col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
    val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("nbg"))
    val cu = cb.groupBy("w1").agg(sum(col("nbg")).as("nw1"))
    val vocab = docs.select(explode(toks).as("tok")).distinct()
      .agg(count(lit(1)).as("v"))
    val lm = cb.join(cu, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        round(-log((col("nbg") + lit(1)).cast("double") /
          (col("nw1") + col("v"))), 6).as("nll"))
    val perDoc = bg.join(lm.hint("shuffle_hash"), Seq("w1", "w2"))
      .groupBy("doc_id", "source")
      .agg(
        (sum(col("nll").cast("decimal(20,12)")).cast("double") / count(lit(1)))
          .as("score"))
    perDoc.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(dmean(round(col("score"), 6)), 6).as("avg_nll"),
        round(min(col("score")), 6).as("min_nll"),
        round(max(col("score")), 6).as("max_nll"))
      .orderBy("source")
  }

  /** X79 DSIR-style importance weights (public method: Xie et al.,
    * "Data Selection for Language Models via Importance Resampling" —
    * hashed-ngram feature LM ratio; here the features are the unigram
    * tokens themselves so the oracle can recompute them). Documents
    * outside the target domain score by the summed log-ratio of
    * add-one-smoothed token probabilities under the target (`lang =
    * targetLang`) vs the raw (rest) distribution; the top-k highest
    * scorers are the raw docs that look most like the target — the
    * resampling candidates. Feature stats are one token-keyed agg over
    * the corpus; totals are a broadcast row; scoring is a token-keyed
    * join that reduces straight onto doc_id. */
  def importanceWeights(
      docs: DataFrame, targetLang: String = "en", k: Int = 25): DataFrame = {
    val tk = docs.select(col("doc_id"), col("lang"), explode(toks).as("tok"))
    val st = tk.groupBy("tok").agg(
      sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("nt"),
      sum(when(col("lang") =!= targetLang, 1L).otherwise(0L)).as("nr"))
    val tot = st.agg(
      sum(col("nt")).as("t_total"), sum(col("nr")).as("r_total"),
      count(lit(1)).as("v"))
    val ratio = st.crossJoin(broadcast(tot))
      .select(col("tok"), round(log(
        ((col("nt") + lit(1)).cast("double") / (col("t_total") + col("v"))) /
        ((col("nr") + lit(1)).cast("double") / (col("r_total") + col("v")))), 6)
        .as("w_lr"))
    tk.filter(col("lang") =!= targetLang)
      .join(ratio, "tok")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("w_lr").cast("decimal(20,12)")).cast("double"), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  // ---- sliding-window chunking (q86) --------------------------------

  /** X82 sliding-window chunk layout for long documents (the standard
    * RAG / context-window preparation: fixed `size`-token windows every
    * `stride` tokens, so consecutive chunks overlap by size − stride).
    * Returns one row per chunk with its token offsets — map-only: an
    * explode over a per-doc `sequence(0, n_chunks−1)`, no shuffle at
    * all, so it scales with the scan. */
  def slidingChunks(docs: DataFrame, size: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && stride <= size, s"need 0 < stride <= size, got $stride/$size")
    docs
      .select(col("doc_id"), col("source"), toks.as("tk"))
      .withColumn("ntok", size_(col("tk")))
      .withColumn("n_chunks",
        when(col("ntok") <= size, lit(1L))
          .otherwise(ceil((col("ntok") - size).cast("double") / stride).cast("long") + 1L))
      .withColumn("chunk_id", explode(sequence(lit(0L), col("n_chunks") - 1)))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("chunk_tokens", least(lit(size.toLong), col("ntok") - col("start_tok")))
      .select(col("doc_id"), col("source"), col("chunk_id"),
        col("start_tok"), col("chunk_tokens"))
  }

  /** Audit view of [[slidingChunks]] — per source: docs, chunks, the
    * multi-chunk share, and the token inflation the overlap costs. The
    * chunk count and token totals are CLOSED-FORM integer arithmetic on
    * the per-doc token count (no explode), so the report costs one
    * map + one source-keyed agg regardless of chunk fan-out. */
  def chunkingStats(docs: DataFrame, size: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && stride <= size, s"need 0 < stride <= size, got $stride/$size")
    val lens = docs.select(col("source"), TF.tokenCount(col("text")).cast("long").as("ntok"))
    val nChunks = when(col("ntok") <= size, lit(1L))
      .otherwise(ceil((col("ntok") - size).cast("double") / stride).cast("long") + 1L)
    val chunkToks = when(col("ntok") <= size, col("ntok"))
      .otherwise((col("n_chunks") - 1) * size + (col("ntok") - (col("n_chunks") - 1) * stride))
    lens
      .withColumn("n_chunks", nChunks)
      .withColumn("chunk_toks", chunkToks)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        sum(col("n_chunks")).as("n_chunks"),
        sum(when(col("n_chunks") > 1, 1L).otherwise(0L)).as("n_multi_chunk"),
        sum(col("chunk_toks")).as("chunk_tokens"),
        round(sum(col("chunk_toks")).cast("double") / sum(col("ntok")), 6)
          .as("inflation"))
      .orderBy("source")
  }

  /** `size` shadowed by the chunk parameter above — Spark's array-length
    * function under a local alias. */
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  // ---- cross-corpus incremental dedup (q87) -------------------------

  /** X83 cross-corpus dedup: drop incoming docs that near-duplicate the
    * EXISTING corpus (the incremental form every growing training set
    * needs — new crawl slices dedup against what is already banked, not
    * against themselves). Here the "new" slice is `doc_id % 2 = 1` and
    * the base is the rest; in production the two sides are different
    * tables.
    *
    * Candidates come from an exact inverted-index join (a new doc and a
    * base doc pair up iff they share a distinct word n-gram — any pair
    * with J ≥ τ > 0 must share one, so candidate generation loses
    * nothing), then exact Jaccard verifies through the same sorted-hash
    * two-pointer kernel as the self-dedup path, with the same provable
    * size-ratio pre-filter. Scale note: the posting join's cost
    * concentrates in high-document-frequency grams (boilerplate) — the
    * `maxDocFreq` cap applies standard posting-list pruning (grams whose
    * corpus-wide document frequency exceeds the cap never generate
    * candidates, losing only pairs whose ONLY shared grams are
    * boilerplate); the other 100 TB route is the MinHash-banded sibling
    * ([[Dedup.minhashNearDups]]) with the two corpora unioned and a side
    * tag. The q87 oracle runs uncapped (exact); the cap's candidate
    * bound is unit-tested with a planted boilerplate gram
    * (CorpusSpec). */
  def crossCorpusDedup(docs: DataFrame, shingleWords: Int = 3,
      threshold: Double = 0.5, maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val spark = docs.sparkSession
    graft.expressions.HashFunctions.register(spark)
    graft.expressions.TextExprs.register(spark)
    val shingled = docs
      .select(col("doc_id"), col("source"), TF.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("source"),
        graft.expressions.TextExprs.distinct_word_ngrams(col("tk"), shingleWords).as("sh"))
      .withColumn("hsh", graft.expressions.TextExprs.xx_sorted_hash(col("sh")))
      .withColumn("sz", size_(col("sh")))
      // reused by both posting sides and both verification joins
      .localCheckpoint(false)
    val isNew = pmod(col("doc_id"), lit(2)) === 1
    val newS = shingled.filter(isNew)
    val baseS = shingled.filter(!isNew)
    val cand = crossCorpusCandidates(newS, baseS, maxDocFreq)
    val dropped = cand
      .join(newS.select(col("doc_id").as("id_new"),
        col("hsh").as("ha"), col("sz").as("sz_a")), "id_new")
      .join(baseS.select(col("doc_id").as("id_base"),
        col("hsh").as("hb"), col("sz").as("sz_b")), "id_base")
      .filter(least(col("sz_a"), col("sz_b")) >=
        lit(threshold) * greatest(col("sz_a"), col("sz_b")))
      .withColumn("inter",
        graft.expressions.HashFunctions.sorted_intersect_count(col("ha"), col("hb")))
      .withColumn("jac",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("id_new").as("doc_id")).distinct()
    newS.select(col("doc_id"), col("source"))
      .join(dropped.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_new"),
        sum(coalesce(col("hit"), lit(0L))).as("n_dropped"),
        round(sum(coalesce(col("hit"), lit(0L))).cast("double") / count(lit(1)), 6)
          .as("drop_rate"))
      .orderBy("source")
  }

  /** Candidate generation for [[crossCorpusDedup]]: the exact inverted-
    * index join, with the df-cap posting-list prune. Both sides carry
    * (doc_id, sh, sz); returns distinct (id_new, id_base).
    *
    * The prune is the standard one: a gram's document frequency across
    * BOTH corpora is one gram-keyed agg over the posting stream; grams
    * past `maxDocFreq` are anti-joined out of the postings before the
    * pair join, so a boilerplate header shared by n docs costs O(n) in
    * the df agg instead of O(n²) in the pair join. Pairs lost are
    * exactly those whose every shared gram is boilerplate — at any
    * useful Jaccard threshold those pairs are overwhelmingly false
    * candidates the verify stage would reject anyway. Exposed separately
    * so the bound is directly unit-testable (candidate COUNT, not just
    * the final report). */
  private[operators] def crossCorpusCandidates(newS: DataFrame, baseS: DataFrame,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    def postings(side: DataFrame, as: String) = side.filter(col("sz") > 0)
      .select(col("doc_id").as(as), explode(col("sh")).as("g"))
    val newP = postings(newS, "id_new")
    val baseP = postings(baseS, "id_base")
    val (newPruned, basePruned) =
      if (maxDocFreq == Int.MaxValue) (newP, baseP)
      else {
        // grams are DISTINCT within a doc (distinct_word_ngrams), so
        // count(*) over the posting stream IS document frequency
        val hot = newP.select(col("g")).unionAll(baseP.select(col("g")))
          .groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDocFreq)
          .select("g")
        (newP.join(hot, Seq("g"), "left_anti"),
          baseP.join(hot, Seq("g"), "left_anti"))
      }
    newPruned.join(basePruned, "g")
      .select("id_new", "id_base").distinct()
  }

  // ---- truncation audit (q84) ---------------------------------------

  /** X80 length-truncation audit: what a per-source p95 token cap would
    * cost. Caps are a source-keyed exact interpolated percentile (20
    * rows — broadcast back), the audit one more source-keyed agg; all
    * token arithmetic stays integral until the displayed percentile.
    * The operational use is sizing max-sequence-length truncation
    * policies per corpus slice before tokenizing 100 TB. */
  def truncationAudit(docs: DataFrame): DataFrame = {
    val lens = docs.select(
      col("source"), col("doc_id"), TF.tokenCount(col("text")).cast("long").as("ntok"))
    val caps = lens.groupBy("source")
      .agg(percentile(col("ntok"), lit(0.95)).as("p95"))
    lens.join(broadcast(caps), "source")
      .withColumn("cap", ceil(col("p95")).cast("long"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("total_tokens"),
        round(max(col("p95")), 6).as("p95_tokens"),
        sum(when(col("ntok") > col("cap"), 1L).otherwise(0L)).as("n_truncated"),
        sum(when(col("ntok") > col("cap"), col("ntok") - col("cap"))
          .otherwise(0L)).as("tokens_dropped"))
      .orderBy("source")
  }

  /** X87 deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES, public algorithm): the k rows with the
    * largest u^(1/w) are a weight-proportional sample. Ranking happens on
    * the monotone-equivalent log(u)/w (closest to zero wins) — no pow,
    * numerically stable for large weights. u comes from the same LCG
    * scramble as the stratified sampler (q29), so the sample is a pure
    * function of doc_id that any engine reproduces bit-for-bit — re-runs
    * and backfills pick identical training subsets.
    *
    * Scale shape: one map-only projection + TakeOrderedAndProject (no
    * sort, no shuffle of the corpus — every partition ships only its own
    * top-k candidates). */
  def weightedSample(docs: DataFrame, weightCol: String = "n_chars",
      k: Int = 20): DataFrame = {
    val u = ((col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483647L) + lit(1L))
      .cast("double") / lit(2147483648.0)
    docs.select(col("doc_id"), col("source"),
        col(weightCol).cast("long").as("w"),
        round(log(u) / col(weightCol).cast("double"), 9).as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(k)
  }

  /** X114 reproducible training-shard assignment — the last step of
    * every curation pipeline: materialize the cleaned corpus as N
    * shards in a pseudorandom but DETERMINISTIC global order, so a
    * re-run (or a second team) produces byte-identical training shards
    * and any shard can be re-created alone. Assignment is a pure
    * function of the id: the widening-safe Knuth multiplicative
    * scramble (fold into [0,2^31) first — products stay under 2^63,
    * engine-identical; the q100 lesson) gives `sort_key`, and
    * `shard = sort_key % nShards`. Training order within a shard is
    * (sort_key, id) ascending; the scramble decorrelates it from crawl
    * order, source, and time.
    *
    * Scale shape: assignment is MAP-ONLY — no shuffle until the writer
    * re-buckets. Write with
    * `.repartition(col("shard")).sortWithinPartitions("shard", "sort_key")
    *  .write.partitionBy("shard")` — one hash shuffle on the shard id,
    * local sorts, one directory per shard. (`partitionBy` on the write
    * keeps shard→file exact even where `repartition(n, col)`'s
    * hash-mod-n would fold two shard ids into one task.) */
  def trainingShards(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = pmod(pmod(col(idCol), lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
    df.withColumn("sort_key", key)
      .withColumn("shard", pmod(col("sort_key"), lit(nShards.toLong)))
  }

  /** X114 shard-balance audit over [[trainingShards]]: one row per
    * shard — doc count, token mass, and an id-sum checksum that pins
    * the exact membership (the oracle re-derives the assignment, so a
    * single misrouted doc breaks the hash compare). One shard-keyed
    * aggregation with map-side partials; the wide text never shuffles
    * (token counts reduce in the map stage). */
  def shardAudit(docs: DataFrame, idCol: String, textCol: Column,
      nShards: Int): DataFrame =
    trainingShards(docs.select(col(idCol), TF.tokenCount(textCol).cast("long").as("_ntok")),
        idCol, nShards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_ntok")).cast("long").as("n_tokens"),
        sum(col(idCol)).cast("long").as("id_sum"))
      .orderBy("shard")

  def packingStats(docs: DataFrame, budget: Int = 512): DataFrame = {
    val packed = packAssignments(docs, budget)

    val perPack = packed.groupBy("lang", "pack")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("pack_tokens"))

    perPack.groupBy("lang")
      .agg(
        count(lit(1)).as("n_packs"),
        sum(col("n_docs")).as("n_docs"),
        (sum(col("n_docs")).cast("double") / count(lit(1))).as("avg_docs_per_pack"),
        round(sum(col("pack_tokens")).cast("double") /
          (count(lit(1)) * lit(budget.toDouble)), 6).as("avg_fill"),
        max(col("pack_tokens")).as("max_pack_tokens"))
      .orderBy("lang")
  }
}
