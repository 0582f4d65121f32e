package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.{CurateConfig, CuratePipeline => CP}

/** Scratch diagnostic (VERDICT r11, next-round #1): which of the curate
  * chain's eager localCheckpoint barriers are still LOAD-BEARING after
  * the token-materialization fix. Three views at a ladder sfDir:
  *
  *  1. cumulative chain cost with ALL barriers, truncated after each
  *     stage (differences = per-barrier materialization cost);
  *  2. end-to-end accounting (the q122 shape) under candidate barrier
  *     sets: ALL, leave-one-out per stage, the minimal sets, NONE;
  *  3. the q123 frozen-derivation side with and without the
  *     upTo=curriculum truncation.
  *
  * Usage: runMain graft.tools.CurateBarrierProbe [sfDir] [reps]
  */
object CurateBarrierProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = graft.GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val cfg = CurateConfig()
      def docs = graft.Tables.documentsSpread(spark, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val stageOrder = CP.StageNames.drop(1)
      val all = stageOrder.toSet

      def timeIt(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }

      val q123only = args.contains("q123only")

      // JIT warm-up: one full chain + accounting
      CP.accounting(CP.stagesSelective(docs, cfg, all)).collect()

      if (!q123only) {
      // 1. cumulative cost, ALL barriers, truncated per stage
      println("== cumulative chain cost (ALL barriers, upTo=stage) ==")
      var prevMs = 0.0
      stageOrder.foreach { s =>
        val ms = (1 to reps).map(_ =>
          timeIt(CP.stagesSelective(docs, cfg, all, upTo = s))).min
        println(f"CHAIN upTo=$s%-11s ${ms}%8.0f ms  (+${ms - prevMs}%6.0f)")
        prevMs = ms
      }

      // 2. q122 accounting under candidate barrier sets
      println("== q122 accounting by barrier set ==")
      val sets: Seq[(String, Set[String])] =
        Seq("ALL" -> all) ++
          stageOrder.map(s => s"-$s" -> (all - s)) ++
          Seq(
            "M4=exact,neardup,decontam,curriculum" ->
              Set("exact", "neardup", "decontam", "curriculum"),
            "M3=neardup,decontam,curriculum" ->
              Set("neardup", "decontam", "curriculum"),
            "M2=neardup,curriculum" -> Set("neardup", "curriculum"),
            "NONE" -> Set.empty[String])
      sets.foreach { case (label, bs) =>
        val r = if (bs.isEmpty) 1 else reps // NONE is the known pathology
        val times = (1 to r).map(_ =>
          timeIt(CP.accounting(CP.stagesSelective(docs, cfg, bs)).collect()))
        println(f"Q122 $label%-40s ${times.min}%8.0f ms" +
          s"  (runs: ${times.map(t => f"$t%.0f").mkString(", ")})")
      }
      }

      // 3. the q123 path, phase by phase (the query's exact cfg)
      println("== q123 phase breakdown (DefaultBarriers, upTo=curriculum, bankNormFp) ==")
      val icfg = CurateConfig(bankNormFp = true)
      val full = docs.filter(pmod(col("doc_id"), lit(100)) =!= 7)
      val delta = docs.filter(pmod(col("doc_id"), lit(100)) === 7)
      (1 to reps).foreach { r =>
        var st: Seq[(String, org.apache.spark.sql.DataFrame)] = null
        var fr: CP.FrozenParams = null
        var inc: Seq[(String, org.apache.spark.sql.DataFrame)] = null
        val phases = Seq[(String, () => Unit)](
          "chain(full,upTo=curriculum)" -> (() =>
            st = CP.stagesSelective(full, icfg, CP.DefaultBarriers, upTo = "curriculum")),
          "frozen construct" -> (() => fr = CP.frozenFromStages(st, icfg)),
          "bankedNorms" -> (() => fr.bankedNorms.count()),
          "index" -> (() => fr.index.count()),
          "benchGrams" -> (() => fr.benchGrams.count()),
          "bounds" -> (() => fr.bounds.count()),
          "alloc" -> (() => fr.alloc.count()),
          "incrementalStages(delta)" -> (() =>
            inc = CP.incrementalStages(delta, fr, icfg)),
          "accounting.collect" -> (() => CP.accounting(inc).collect()))
        val line = phases.map { case (n, f) => f"$n=${timeIt(f())}%.0f" }
        println(s"Q123[$r] ${line.mkString(" ")}")
      }
    } finally spark.stop()
  }
}
