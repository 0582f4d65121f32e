package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.{TextFunctions => TF}

/** Planted-defect dedup tests (reference pattern:
  * tests/fixtures/quality_test_data.py injects duplicates;
  * tests/test_quality_metrics.py:350-478 asserts they're found). */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while rain falls on the quiet town square"
  private val nearDup = base.replace("quiet", "busy") // one-word edit
  private val unrelated =
    "completely different content about databases indexes and storage engines at scale"

  test("chunk-stitch audit: planted head-tail stitches found, self-matches excluded, short docs skipped") {
    val d = Seq(
      (1L, "a b c x y z p q r"),   // head "a b c", tail "p q r"
      (2L, "p q r m n o a b c"),   // head "p q r", tail "a b c" — stitches with d1 both ways
      (3L, "s s s t t t s s s"),   // own head == own tail: self only, 0 stitch pairs
      (4L, "a b c"))               // < 2k tokens: head/tail would overlap, skipped
      .toDF("doc_id", "text")
    val out = Dedup.chunkStitchAudit(d, col("text"), k = 3).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(out.keySet == Set("a b c", "p q r"), s"got ${out.keySet}")
    assert(out("a b c") == ((1L, 1L, 0L, 1L)))
    assert(out("p q r") == ((1L, 1L, 0L, 1L)))
  }

  test("exact duplicate groups found after whitespace normalization") {
    val df = Seq((1L, "Hello  World"), (2L, " hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactDuplicateGroups(df, col("text")).collect()
    assert(groups.length == 1 && groups.head.getAs[Long]("n") == 2L)
  }

  test("normalized-dedup audit collapses punctuation/case twins only") {
    val df = Seq(
      (1L, "a", "Hello, World!"),
      (2L, "a", "hello world"),       // twin of 1 under aggressive keys
      (3L, "a", "HELLO ... world?!"), // twin of 1 and 2
      (4L, "a", "goodbye world"),     // distinct
      (5L, "b", "Unrelated text."))
      .toDF("doc_id", "source", "text")
    val out = Dedup.normalizedDupAudit(df, col("text"), col("source"))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_distinct"), r.getAs[Long]("dup_docs"))))
      .toMap
    assert(out("a") == ((4L, 2L, 2L)))
    assert(out("b") == ((1L, 1L, 0L)))
  }

  test("minhash LSH finds the planted near-dup pair and not the unrelated one") {
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, "tiny"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", col("text"),
        shingleWords = 2, k = 12, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("size-bound pre-filter keeps qualifying containment pairs, drops sub-threshold ones") {
    // shingles(B) ⊃ shingles(A) makes J = |A|/|B| exactly — the size
    // bound's equality case. A↔C sits just above threshold 0.5 and must
    // survive the filter; A↔B sits just below and must be dropped.
    val a = (1 to 11).map(i => s"w$i").mkString(" ")            // 10 bigrams
    val b = a + " " + (1 to 12).map(i => s"x$i").mkString(" ")  // 22 bigrams, J=10/22
    val c = a + " " + (1 to 8).map(i => s"y$i").mkString(" ")   // 18 bigrams, J=10/18
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(df, "doc_id", col("text"),
        shingleWords = 2, k = 12, bands = 12, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jac")).toMap
    assert(pairs.contains((1L, 3L)), s"J=10/18 pair must survive the size bound: $pairs")
    assert(math.abs(pairs((1L, 3L)) - 10.0 / 18.0) < 1e-12)
    assert(!pairs.contains((1L, 2L)), "J=10/22 is below threshold and must be dropped")
  }

  test("preCollapse output is EXACTLY the uncollapsed pipeline's (uncapped)") {
    // a family of exact-shingle-set twins (one verbatim, one with extra
    // whitespace — same token sequence), a near-dup, an unrelated doc,
    // and a shingle-less family ("solo" twins: no bigrams, so the plain
    // pipeline filters them — pre-collapse must NOT resurrect them as a
    // jac=1.0 within-group pair)
    val ws = base.replace(" ", "  ") // same tokens, different raw text
    val df = Seq((1L, base), (2L, base), (7L, ws), (3L, nearDup),
      (4L, unrelated), (5L, "solo"), (6L, "solo")).toDF("doc_id", "text")
    def run(pc: Boolean) = Dedup.minhashNearDups(df, "doc_id", col("text"),
        shingleWords = 2, k = 12, bands = 4, threshold = 0.5, preCollapse = pc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = run(false)
    val collapsed = run(true)
    assert(collapsed == plain, s"pre-collapse diverged:\nplain=$plain\ncollapsed=$collapsed")
    // sanity on the content: the twin family is all-pairs at exactly 1.0
    for (p <- Seq((1L, 2L), (1L, 7L), (2L, 7L)))
      assert(plain.contains((p._1, p._2, 1.0)), s"missing twin pair $p in $plain")
    assert(!plain.exists(t => t._1 == 5L || t._2 == 6L), "shingle-less docs paired")
  }

  test("band-bucket cap skips the degenerate family; pre-collapse restores it bucket-legally") {
    // 40 verbatim copies of one doc: every band has a 40-doc bucket, past
    // the cap of 32 -> capped-only output drops the family entirely but
    // keeps the small honest near-dup pair. With preCollapse the family
    // is ONE rep (bucket size 1) and re-expands to all 780 pairs at 1.0.
    // the under-cap pair is a verbatim twin of the UNRELATED text so its
    // bucket (size 2) deterministically never merges with the family's
    val family = (100L until 140L).map(i => (i, base))
    val df = (family ++ Seq((1L, unrelated), (2L, unrelated)))
      .toDF("doc_id", "text")
    def run(cap: Int, pc: Boolean) = Dedup.minhashNearDups(df, "doc_id",
        col("text"), shingleWords = 2, k = 12, bands = 4, threshold = 0.5,
        maxBucket = cap, preCollapse = pc)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = run(32, pc = false)
    assert(capped.contains((1L, 2L, 1.0)), s"under-cap pair lost: $capped")
    assert(!capped.exists(t => t._1 >= 100L), s"degenerate family scored: $capped")
    val cappedCollapsed = run(32, pc = true)
    val familyPairs = cappedCollapsed.filter(t => t._1 >= 100L)
    assert(familyPairs.size == 40 * 39 / 2 && familyPairs.forall(_._3 == 1.0),
      s"expected 780 within-family pairs at 1.0, got ${familyPairs.size}")
    assert(cappedCollapsed.contains((1L, 2L, 1.0)))
  }

  test("bucket audit: hand-checked flagged accounting on a planted hot bucket") {
    val family = (100L until 140L).map(i => (i, base))
    val df = (family ++ Seq((1L, unrelated))).toDF("doc_id", "text")
    val audit = Dedup.minhashBucketAudit(df, "doc_id", col("text"),
      shingleWords = 2, k = 12, bands = 4, maxBucket = 32)
      .collect()
    assert(audit.length == 4)
    audit.foreach { r =>
      // per band: the 40-doc family shares every band key; the unrelated
      // doc lands in its own bucket (disjoint vocabulary -> disjoint
      // shingle hashes -> a different signature block)
      assert(r.getAs[Long]("n_flagged") == 1L, r.toString)
      assert(r.getAs[Long]("rows_in_flagged") == 40L, r.toString)
      assert(r.getAs[Long]("max_bucket") == 40L, r.toString)
      assert(r.getAs[Long]("cand_pairs_skipped") == 40L * 39 / 2, r.toString)
      assert(r.getAs[Long]("n_buckets") >= 2L, r.toString)
    }
  }

  test("jaccard is exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].head()
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("simhash: identical texts collide, near-dups are close, unrelated far") {
    val df = Seq((1L, base), (2L, base), (3L, nearDup), (4L, unrelated))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash(TF.tokens(col("text"))).as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fp(1L) == fp(2L))
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)))
  }

  test("hamming column matches bit arithmetic") {
    val d = Seq((5L, 3L)).toDF("a", "b")
      .select(Dedup.hamming(col("a"), col("b"))).first().getInt(0)
    assert(d == java.lang.Long.bitCount(5L ^ 3L))
  }

  test("simhash kernel expression matches the HOF formulation") {
    graft.expressions.HashFunctions.register(spark)
    import graft.expressions.{HashFunctions => HF}
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, ""))
      .toDF("doc_id", "text")
    val both = df.select(
      Dedup.simhash(TF.tokens(col("text"))).as("hof"),
      HF.simhash_bits(HF.poly_hash_array(TF.tokens(col("text"))), 30).as("kernel"))
    assert(both.collect().forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("banded simhash pairs == brute-force pairs on adversarial fingerprints") {
    // fingerprints planted at distances straddling the threshold, plus a
    // pseudo-random cloud; brute force is the ground truth
    val rng = new scala.util.Random(7)
    val planted = Seq(
      0L, 1L << 3, (1L << 3) | (1L << 17) | (1L << 29), // dist 1 and 3 from 0
      0x3FFFFFFFL, 0x3FFFFFFFL ^ 0xFFL)                 // far from 0, dist 8 apart
    val fps = planted ++ Seq.fill(60)(rng.nextLong() & 0x3FFFFFFFL)
    val df = fps.zipWithIndex.map { case (fp, i) => (i.toLong, fp, "blk") }
      .toDF("id", "fp", "key")
    def pairSet(d: org.apache.spark.sql.DataFrame) =
      d.select("id_a", "id_b", "dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    for (maxDist <- Seq(0, 1, 4, 8)) {
      val banded = pairSet(
        Dedup.simhashNearDupPairs(df, "id", "fp", Seq("key"), maxDist))
      val brute = (for {
        (a, i) <- fps.zipWithIndex; (b, j) <- fps.zipWithIndex
        if i < j && java.lang.Long.bitCount(a ^ b) <= maxDist
      } yield (i.toLong, j.toLong, java.lang.Long.bitCount(a ^ b))).toSet
      assert(banded == brute, s"maxDist=$maxDist")
    }
  }

  test("banded simhash plan contains no all-pairs join (equi-join on chunk key)") {
    val df = Seq((1L, 5L, "x"), (2L, 7L, "x")).toDF("id", "fp", "key")
    val plan = Dedup.simhashNearDupPairs(df, "id", "fp", Seq("key"), maxDist = 4)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("chunk_id") && plan.contains("chunk_val"))
  }

  test("jaccard kernel skips shingle-less docs instead of emitting NaN pairs") {
    val a: Array[Long] = Array()
    val items: Array[(Long, Array[Long])] =
      Array((1L, a), (2L, a), (3L, Array(10L, 20L)), (4L, Array(10L, 20L, 30L)))
    val top = JaccardKernels.topPairs(items, null, k = 10).toSeq
    assert(top.forall(!_._3.isNaN))
    assert(top.exists { case (x, y, _) => x == 3L && y == 4L })
    // the empty-empty pair (1,2) must not appear
    assert(!top.exists { case (x, y, _) => x == 1L && y == 2L })
  }

  test("jaccardTopPairsBlocked accepts a non-string blocking key") {
    graft.expressions.TextExprs.register(spark)
    val df = Seq((1L, 7, Array(1L, 2L, 3L)), (2L, 7, Array(2L, 3L, 4L)))
      .toDF("doc_id", "blk", "hsh")
    val out = Dedup.jaccardTopPairsBlocked(df, "blk", "doc_id", "hsh", k = 5)
    assert(out.count() == 1)
  }

  private def jacRows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  /** Hash-set fixture with twin families across two blocking keys: sets
    * A (ids 1,2,3 identical), B (ids 10,11 identical, overlaps A), a
    * singleton C, two shingle-less docs (90, 91), and a second key with
    * its own twins — the duplicate-dense regime the pre-collapse is for. */
  private lazy val collapseFixture = Seq(
    ("en", 1L, Array(1L, 2L, 3L, 4L)), ("en", 2L, Array(1L, 2L, 3L, 4L)),
    ("en", 3L, Array(1L, 2L, 3L, 4L)),
    ("en", 10L, Array(2L, 3L, 4L, 5L)), ("en", 11L, Array(2L, 3L, 4L, 5L)),
    ("en", 20L, Array(7L, 8L)),
    ("en", 90L, Array.empty[Long]), ("en", 91L, Array.empty[Long]),
    ("de", 50L, Array(1L, 2L, 3L, 4L)), ("de", 51L, Array(1L, 2L, 3L, 4L)),
    ("de", 52L, Array(9L, 10L)))
    .toDF("lang", "doc_id", "hsh")

  test("jaccard collapsed == blocked on a twin-dense corpus, through the k boundary") {
    for (k <- Seq(3, 6, 50)) {
      val collapsed = jacRows(Dedup.jaccardTopPairsCollapsed(
        collapseFixture, "lang", "doc_id", "hsh", k, nBlocks = 3))
      val blocked = jacRows(Dedup.jaccardTopPairsBlocked(
        collapseFixture, "lang", "doc_id", "hsh", k, nBlocks = 3))
      assert(collapsed == blocked, s"k=$k")
    }
  }

  test("jaccard collapsed: shingle-less docs never pair each other, cross real docs at 0.0") {
    val out = jacRows(Dedup.jaccardTopPairsCollapsed(
      collapseFixture, "lang", "doc_id", "hsh", k = 50, nBlocks = 2))
    assert(!out.exists(t => t._2 == 90L && t._3 == 91L),
      "two empty sets give 0/0 - undefined, skipped by both paths")
    assert(out.exists(t => (t._2, t._3, t._4) == (1L, 90L, 0.0)),
      "an empty set still crosses real docs at jac 0.0, like the uncollapsed kernel")
  }

  test("jaccard collapsed guard counts REPRESENTATIVES, not raw rows") {
    // 40 rows / 2 distinct encodings: passes a 5-rep cap the uncollapsed
    // path would refuse
    val df = (0 until 40).map(i => ("en", i.toLong, Array(1L + i % 2, 5L)))
      .toSeq.toDF("lang", "doc_id", "hsh")
    val out = jacRows(Dedup.jaccardTopPairsCollapsed(df, "lang", "doc_id", "hsh",
      k = 2, nBlocks = 2, maxReps = 5))
    assert(out.map(t => (t._2, t._3, t._4)) == Seq((0L, 2L, 1.0), (0L, 4L, 1.0)))
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardTopPairsCollapsed(df, "lang", "doc_id", "hsh", k = 2, maxReps = 1)
    }
    assert(e.getMessage.contains("preCollapse"))
  }

  test("JaccardKernels.withinPairs: lexical order and k cap") {
    assert(JaccardKernels.withinPairs(Array(2L, 5L, 9L), k = 2).toSeq ==
      Seq((2L, 5L), (2L, 9L)))
    assert(JaccardKernels.withinPairs(Array(2L, 5L, 9L), k = 10).toSeq ==
      Seq((2L, 5L), (2L, 9L), (5L, 9L)))
    assert(JaccardKernels.withinPairs(Array(7L), k = 5).isEmpty)
  }

  test("size guard refuses oversized exact-pair inputs") {
    val df = spark.range(100).select(col("id").as("doc_id"),
      lit(7).as("blk"), array(lit(1L)).as("hsh"))
    val e = intercept[IllegalArgumentException] {
      Dedup.jaccardTopPairsBlocked(df, "blk", "doc_id", "hsh", k = 5, maxRows = 50)
    }
    assert(e.getMessage.contains("guard"))
    // the exact-contract escalation comes FIRST in the guidance, then the
    // approximate route
    assert(e.getMessage.contains("jaccardTopPairsCollapsed"))
    assert(e.getMessage.contains("minhashNearDups"))
  }

  test("64-bit simhash + banding: near-dups pair up, unrelated don't") {
    graft.expressions.HashFunctions.register(spark)
    val df = Seq((1L, base), (2L, nearDup), (3L, base), (4L, unrelated))
      .toDF("doc_id", "text")
      .select(col("doc_id"), lit("all").as("blk"),
        Dedup.simhash64(TF.tokens(col("text"))).as("fp"))
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "fp", Seq("blk"),
        maxDist = 12, bits = 64)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L))) // identical texts: distance 0
    assert(pairs.contains((1L, 2L)) == pairs.contains((2L, 3L))) // symmetry
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L }) // unrelated stays out
  }

  test("near-dup clusters: chains collapse to min-id components (both paths)") {
    // component {1,2,3} as a chain (needs propagation), clique {10,11},
    // and a long path {20..24} to exercise multiple rounds
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L, 24L -> 20L)
    // driver-side union-find (default) and distributed label propagation
    // (forced by a zero threshold) must agree
    for (threshold <- Seq(100000, 0)) {
      val got = Dedup.nearDupClusters(pairs, driverThreshold = threshold).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"driverThreshold=$threshold")
    }
  }

  test("distributed clustering converges on a 40-hop chain (pointer jumping)") {
    val pairs = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(pairs, driverThreshold = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 41 && got.values.forall(_ == 0L))
  }

  test("full-width simhash chunk (bits=64, maxDist=0) keeps a real banding key") {
    val df = Seq((1L, 123456789L), (2L, 123456789L), (3L, -987654321L), (4L, 555L))
      .toDF("id", "fp").withColumn("blk", lit("x"))
    val pairs = Dedup.simhashNearDupPairs(df, "id", "fp", Seq("blk"),
        maxDist = 0, bits = 64)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L))) // only the identical fingerprints
    // the chunk value must be the fingerprint itself, not a constant
    val chunked = Dedup.simhashNearDupPairs(df, "id", "fp", Seq("blk"),
      maxDist = 0, bits = 64)
    val plan = chunked.queryExecution.optimizedPlan.toString
    assert(!plan.contains("& 0)")) // a zero mask would constant-fold the key
  }

  test("dedupByCluster keeps one doc per cluster plus all unpaired docs") {
    val docs = Seq((1L, base), (2L, base), (3L, base), (7L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByCluster(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 7L))
  }

  test("dedupByClusterBest keeps the top-scoring member, ties to min id") {
    val docs = Seq(
      (1L, base, 5), (2L, base, 9), (3L, base, 9), // one cluster: 2 and 3 tie on score
      (7L, unrelated, 1)) // unpaired: always kept
      .toDF("doc_id", "text", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupByClusterBest(docs, "doc_id", pairs, col("score"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 7L)) // 2 beats 1 on score, beats 3 on id tie
  }

  test("dedupByClusterBest with a constant score degenerates to min-id keep") {
    val docs = Seq((1L, base), (2L, base), (3L, base), (7L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val best = Dedup.dedupByClusterBest(docs, "doc_id", pairs, lit(1))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val minId = Dedup.dedupByCluster(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(best == minId && best == Set(1L, 7L))
  }

  test("split leakage: contaminated held doc flagged, clean and short held docs pass") {
    // LCG residues hand-computed: among ids 0..9 and 27, exactly 7 and 27
    // land in the heldout class (key%10 == 9). Doc 7 repeats doc 2's
    // 10-token text => 3 leaked 8-gram windows; doc 27 (source B) has
    // only 5 tokens => no grams, counts clean.
    val tenTok = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val rows = (0L to 9L).map { i =>
      val txt = if (i == 7L) tenTok
      else if (i == 2L) tenTok
      else s"filler${i}a filler${i}b filler${i}c filler${i}d filler${i}e " +
        s"filler${i}f filler${i}g filler${i}h filler${i}i"
      (i, "A", txt)
    } :+ ((27L, "B", "kilo lima mike november oscar"))
    val docs = rows.toDF("doc_id", "source", "text")
    val out = Dedup.splitLeakage(docs, "doc_id", col("text"), col("source"), k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toList
    assert(out == List(("A", 1L, 1L, 100.0, 3L), ("B", 1L, 0L, 0.0, 0L)))
    // repartition-invariant: the audit is all keyed aggregation
    val out2 = Dedup.splitLeakage(docs.repartition(7), "doc_id",
      col("text"), col("source"), k = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toList
    assert(out2 == out)
  }

  test("end-to-end dedup: minhash pairs -> clusters -> deduped corpus") {
    val docs = Seq((1L, base), (2L, nearDup), (3L, base), (4L, unrelated))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", col("text"),
      shingleWords = 2, k = 12, bands = 4, threshold = 0.5)
    val kept = Dedup.dedupByCluster(docs, "doc_id", pairs.select("id_a", "id_b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L)) // 1/2/3 are one near-dup cluster
  }

  test("threshold sweep: hand-computed curve over a fixed pair set") {
    // pairs: (1,2,.95) (1,3,.7) (4,5,.55) — doc-max: 1→.95 2→.95 3→.7 4→.55 5→.55
    val pairs = Seq((1L, 2L, 0.95), (1L, 3L, 0.7), (4L, 5L, 0.55))
      .toDF("id_a", "id_b", "jac")
    val out = Dedup.thresholdSweep(pairs, col("jac"), Seq(0.5, 0.8, 0.99))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out(0) == ((0.5, 3L, 5L, Some(0.733333))))  // (0.95+0.7+0.55)/3
    assert(out(1) == ((0.8, 1L, 2L, Some(0.95))))      // only (1,2); docs {1,2}
    assert(out(2) == ((0.99, 0L, 0L, None)))           // empty bucket -> null mean
  }

  test("threshold sweep matches a reference model on random pair sets") {
    // deterministic pseudo-random pair sets; the conditional-sum plan must
    // agree with the obvious per-threshold filter on counts AND doc sets
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      val raw = (1 to n).map { _ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong,
          math.rint(rnd.nextDouble() * 1e6) / 1e6)
      }.collect { case (a, b, s) if a != b => (math.min(a, b), math.max(a, b), s) }
        .distinct
      val ts = Seq(0.2, 0.5, 0.8)
      val got = Dedup.thresholdSweep(raw.toDF("id_a", "id_b", "jac"), col("jac"), ts)
        .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSeq
      val want = ts.map { t =>
        val keep = raw.filter(_._3 >= t)
        (t, keep.size.toLong, keep.flatMap(p => Seq(p._1, p._2)).distinct.size.toLong)
      }
      assert(got == want, s"n=$n")
    }
  }

  test("X127 dup-family histogram: sizes, yield forecast, and whitespace-normalized keys") {
    val docs = Seq(
      (1L, "a b c"), (2L, "A  b   C"), (3L, " a b c "), // one family of 3 (normalized)
      (4L, "x y"), (5L, "x y"),                          // family of 2
      (6L, "solo one two three"))                        // family of 1
      .toDF("doc_id", "text")
    val got = Dedup.dupFamilyStats(docs, col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    // family of 3: each member 3 tokens → 9 total, 6 removable;
    // family of 2: 2 tokens each → 2 removable; singleton: nothing
    assert(got == List(
      (1L, 1L, 1L, 0L, 0L),
      (2L, 1L, 2L, 1L, 2L),
      (3L, 1L, 3L, 2L, 6L)))
  }
}
