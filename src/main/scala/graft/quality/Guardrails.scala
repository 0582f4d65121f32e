package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F5 duration guardrails + F12 check routing.
  *
  * Guardrails (reference: cli/commands/materialize.py:169-236): drop
  * segments above a duration ceiling, reporting the top offenders —
  * a sanitation pass between materialization steps.
  *
  * Routing (reference: quality/validator_router.py:129-165 +
  * config/validator_routing.yaml): a declarative table of which checks
  * run for which artifact role; driver-side rule dispatch, not Catalyst.
  */
object Guardrails {

  val SpanMaxDuration = 240.0 // materialize.py guardrail defaults
  val BeatMaxDuration = 360.0

  final case class GuardrailResult(kept: DataFrame, dropped: DataFrame, topOffenders: Seq[(String, Double)])

  /** Split at the ceiling; capture the top-5 dropped by duration
    * (materialize.py logs exactly these). No caching: the split is a
    * pushed-down filter, so `kept`/`dropped` each cost one pruned scan —
    * cheaper than pinning the whole table in executor storage for the
    * session's lifetime. */
  def apply(segments: DataFrame, idCol: String, maxDuration: Double): GuardrailResult = {
    val kept = segments.filter(col("duration") <= maxDuration)
    val dropped = segments.filter(col("duration") > maxDuration)
    val top = dropped.select(col(idCol), col("duration"))
      .orderBy(col("duration").desc, col(idCol)).limit(5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    GuardrailResult(kept, dropped, top)
  }

  // ---- F12: check routing -------------------------------------------

  /** Which checks apply to which artifact role (the yaml's semantics as a
    * typed rule table; extend via `withRoute`). */
  final case class Routing(routes: Map[String, Set[String]]) {
    def checksFor(role: String): Set[String] = routes.getOrElse(role, Set.empty)
    def withRoute(role: String, checks: Set[String]): Routing =
      Routing(routes + (role -> (checksFor(role) ++ checks)))
  }

  /** Defaults mirroring config/validator_routing.yaml's base-vs-embedding
    * split: structural checks on base tables, dim/join-back on embeddings. */
  val defaultRouting: Routing = Routing(Map(
    "base" -> Set("timestamps", "text", "ids", "referential", "durations", "duplicates"),
    "embedding" -> Set("ids", "dim_consistency", "id_join_back")))

  /** J4/V16: embedding-side checks — dim consistency and id join-back
    * (every artifact_id must exist in the base table). */
  def embeddingChecks(embeddings: DataFrame, base: DataFrame, baseIdCol: String): DataFrame = {
    val dims = embeddings.agg(
      countDistinct(size(col("embedding"))).as("n_distinct_dims"),
      min(size(col("embedding"))).cast("long").as("min_dim"),
      max(size(col("embedding"))).cast("long").as("max_dim"))
    val orphans = embeddings.join(
        base.select(col(baseIdCol).as("artifact_id")), Seq("artifact_id"), "left_anti")
      .agg(count(lit(1)).as("n_orphan_embeddings"))
    dims.crossJoin(orphans)
  }
}
