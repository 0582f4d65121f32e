package graft.validation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality validation check suite — the engine behind the
  * `validate` CLI command (reference: src/lakehouse/validation/checks.py,
  * cli/commands/validate.py:66).
  *
  * Check families (reference line refs):
  *   - non-empty / required-fields / schema       (checks.py:122-228)
  *   - timestamp nulls / monotonic / negative     (checks.py:231-322)
  *   - text nulls / empties / length stats        (checks.py:325-398)
  *   - ID nulls, PK uniqueness, FK cardinality    (checks.py:401-479)
  *   - referential integrity, incl. DEEP child-ID (checks.py:482-551 —
  *     the reference only null-checks the array column; here orphans are
  *     found for real via explode + LEFT ANTI join against the child table)
  *   - numeric NaN / Inf                          (checks.py:554-607)
  *
  * Scale design: the reference runs one pandas pass per check (~20 scans
  * of each table). Here every per-row counter — null IDs, PK duplicate
  * rows, FK cardinality, NaN/Inf, negative/inverted timestamps, empty
  * text — folds into ONE aggregation job per table (duplicate rows via
  * count − count_distinct, both distributed hash aggregates), and only
  * the referential checks add joins, each an equi-shuffle or broadcast
  * on the key being checked. Validating a 100 TB table costs one scan
  * plus one join per FK/child-array constraint.
  *
  * Check rows come back as a DataFrame (table_name, check_name, severity,
  * passed, metric) so downstream gating/reporting is itself relational.
  */
object Validation {

  /** What to validate on one table. Column lists default to
    * schema-driven auto-detection (same heuristics as the reference:
    * `*_id` columns, float/double numerics, start/end time pairs). */
  final case class TableSpec(
      name: String,
      /** Each entry is one primary key, possibly composite. */
      primaryKeys: Seq[Seq[String]] = Nil,
      /** (fkCol, parentName, parentKeyCol): every non-null fkCol value
        * must exist in parent[parentKeyCol]. */
      foreignKeys: Seq[(String, String, String)] = Nil,
      /** (arrayCol, childName, childKeyCol): every element of arrayCol
        * must exist in child[childKeyCol] — deep referential integrity. */
      childArrays: Seq[(String, String, String)] = Nil,
      /** Extra key columns to null-check beyond the `*_id` auto-detection
        * (TPC-H-style names like `o_orderkey` need this). */
      idCols: Seq[String] = Nil)

  val CheckSchema: StructType = StructType(Seq(
    StructField("table_name", StringType, nullable = false),
    StructField("check_name", StringType, nullable = false),
    StructField("severity", StringType, nullable = false),
    StructField("passed", BooleanType, nullable = false),
    StructField("metric", LongType, nullable = true)))

  private def idColumns(df: DataFrame): Seq[String] =
    df.columns.toSeq.filter(_.endsWith("_id"))

  private def floatingColumns(df: DataFrame): Seq[String] =
    df.schema.fields.toSeq.collect {
      case StructField(n, DoubleType | FloatType, _, _) => n
    }

  private def timeColumns(df: DataFrame): Seq[String] =
    Seq("start_time", "end_time", "start", "end").filter(df.columns.contains)

  private def timePair(df: DataFrame): Option[(String, String)] =
    if (df.columns.contains("start_time") && df.columns.contains("end_time"))
      Some(("start_time", "end_time"))
    else if (df.columns.contains("start") && df.columns.contains("end"))
      Some(("start", "end"))
    else None

  private def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  /** All single-pass checks for a table: ONE plain aggregation job for
    * every per-row counter, plus one per-key aggregate per PK/FK
    * uniqueness check, unpivoted to check rows.
    *
    * The distinct-style counters deliberately avoid `count_distinct`:
    * several distinct aggregates in one job make Catalyst plan an
    * Expand(×k) that multiplies every input row before the first
    * aggregate — at 100 TB that triples shuffle input. A groupBy(key)
    * per check collapses duplicate keys map-side instead, and the
    * resulting single-row frames are crossJoined (1×1 rows) back onto
    * the main counter row. */
  def counterChecks(df: DataFrame, spec: TableSpec,
      enabled: Option[Set[String]] = None,
      skipFkCardinality: Boolean = false): DataFrame = {
    def on(family: String): Boolean = enabled.forall(_.contains(family))
    val ids =
      if (on("ids")) (idColumns(df) ++ spec.idCols.filter(df.columns.contains)).distinct
      else Nil
    val pkCols =
      if (on("duplicates")) spec.primaryKeys.filter(_.forall(df.columns.contains)) else Nil
    val floats = if (on("numerics")) floatingColumns(df) else Nil
    val times = if (on("timestamps")) timeColumns(df) else Nil
    val hasText = on("text") && df.columns.contains("text")

    val aggs = Seq.newBuilder[Column]
    val checks = Seq.newBuilder[(String, String, Column)] // (name, severity, passedExpr)
    def add(name: String, severity: String, agg: Column, passed: Column): Unit = {
      aggs += agg.cast("long").as(s"_m_$name")
      checks += ((name, severity, passed))
    }
    def m(name: String): Column = col(s"_m_$name")

    add("non_empty_table", "error", count(lit(1)), m("non_empty_table") > 0)
    ids.foreach { c =>
      add(s"id_nulls_$c", "error", cnt(col(c).isNull), m(s"id_nulls_$c") === 0)
    }
    floats.foreach { c =>
      add(s"numeric_nans_$c", "error", cnt(isnan(col(c))), m(s"numeric_nans_$c") === 0)
      add(s"numeric_inf_$c", "error",
        cnt(col(c) === Double.PositiveInfinity || col(c) === Double.NegativeInfinity),
        m(s"numeric_inf_$c") === 0)
    }
    times.foreach { c =>
      add(s"timestamp_nulls_$c", "error", cnt(col(c).isNull), m(s"timestamp_nulls_$c") === 0)
      add(s"timestamp_negative_$c", "error", cnt(col(c) < 0), m(s"timestamp_negative_$c") === 0)
    }
    if (on("timestamps")) timePair(df).foreach { case (s, e) =>
      add("timestamp_monotonic", "error", cnt(col(s) > col(e)), m("timestamp_monotonic") === 0)
    }
    if (hasText) {
      add("text_nulls", "error", cnt(col("text").isNull), m("text_nulls") === 0)
      add("text_empty", "warning", cnt(length(col("text")) === 0), m("text_empty") === 0)
    }

    val aggList = aggs.result()
    val agged = df.agg(aggList.head, aggList.tail: _*)
    val rows = checks.result().map { case (name, severity, passed) =>
      struct(
        lit(spec.name).as("table_name"),
        lit(name).as("check_name"),
        lit(severity).as("severity"),
        coalesce(passed, lit(true)).as("passed"), // empty-table aggs → null counters
        m(name).as("metric"))
    }
    val mainRows = agged.select(explode(array(rows: _*)).as("c")).select(col("c.*"))

    // The per-key aggregates come back as UNIONED check rows, not
    // crossJoined 1-row frames: each crossJoin side is a separate
    // broadcast job, so k constraints cost k+1 driver actions; a union
    // schedules all of them inside the one job that consumes the result.
    val extra = Seq.newBuilder[DataFrame]
    def checkRow(frame: DataFrame, name: String, severity: String,
        passed: Column): DataFrame =
      frame.select(
        lit(spec.name).as("table_name"),
        lit(name).as("check_name"),
        lit(severity).as("severity"),
        passed.as("passed"),
        col("metric"))

    // PK duplicate rows = Σ over key groups of (n − 1): a two-phase
    // hash aggregate on the key, no Expand
    pkCols.foreach { pk =>
      val name = s"id_duplicates_${pk.mkString("_")}"
      extra += checkRow(
        df.filter(pk.map(col(_).isNotNull).reduce(_ && _))
          .groupBy(pk.map(col): _*)
          .agg(count(lit(1)).as("_n"))
          .agg(coalesce(sum(col("_n") - 1), lit(0L)).cast("long").as("metric")),
        name, "error", col("metric") === 0)
    }
    // FK cardinality (info): count of distinct non-null values (skipped
    // when validateTable routes the FK through the fused key-space path)
    if (on("referential") && !skipFkCardinality) spec.foreignKeys.foreach { case (fk, _, _) =>
      extra += checkRow(
        df.filter(col(fk).isNotNull).select(col(fk)).distinct()
          .agg(count(lit(1)).cast("long").as("metric")),
        s"id_foreign_key_$fk", "info", lit(true))
    }
    (mainRows +: extra.result()).reduce(_.unionByName(_))
  }

  /** Fused key-space checks for one FK column — FK cardinality (info)
    * and orphan rows (vs the parent key) from ONE `groupBy(fk)`
    * aggregation: the naive formulation shuffles the full child table
    * once for `count(DISTINCT fk)` and AGAIN for the row-level orphan
    * anti-join; here the child shuffles once into fk groups, orphans fold
    * in as a LEFT join against the DISTINCT parent keys (an unmatched
    * group keeps its row with a null hit marker, weighted by its row
    * count to match the row-level anti-join metric), and both metrics
    * come out of one global aggregation. At 100 TB that halves the
    * fact-table shuffle volume for referential checks. The grouped side
    * is already hash-partitioned on fk, so the join re-exchanges only the
    * parent key set (or broadcasts it, for dimension parents).
    *
    * PK-duplicate checks deliberately stay in their own branch
    * ([[counterChecks]]): folding them in here (per-group countDistinct
    * of the key remainder) was measured SLOWER end-to-end — it serializes
    * the whole check suite behind one 4-phase distinct-aggregate chain,
    * while separate branches execute as concurrent stages. */
  private def fusedKeyChecks(df: DataFrame, spec: TableSpec, fk: String,
      parent: Option[DataFrame], parentKey: String): Seq[DataFrame] = {
    val g = df.filter(col(fk).isNotNull).groupBy(col(fk))
      .agg(count(lit(1)).cast("long").as("_n"))
    val joined = parent match {
      case Some(p) =>
        g.join(p.select(col(parentKey).as(fk)).distinct().withColumn("_hit", lit(true)),
          Seq(fk), "left")
      case None => g.withColumn("_hit", lit(true))
    }
    val metrics = Seq(count(lit(1)).cast("long").as("_card")) ++
      parent.map(_ =>
        coalesce(sum(when(col("_hit").isNull, col("_n"))), lit(0L)).cast("long").as("_orph"))
    val agged = joined.agg(metrics.head, metrics.tail: _*)
    val rows = Seq(
      struct(
        lit(spec.name).as("table_name"),
        lit(s"id_foreign_key_$fk").as("check_name"),
        lit("info").as("severity"),
        lit(true).as("passed"),
        col("_card").as("metric"))) ++
      parent.map(_ => struct(
        lit(spec.name).as("table_name"),
        lit(s"referential_integrity_$fk").as("check_name"),
        lit("error").as("severity"),
        (col("_orph") === 0).as("passed"),
        col("_orph").as("metric")))
    Seq(agged.select(explode(array(rows: _*)).as("c")).select(col("c.*")))
  }

  /** Scalar-FK orphan check: non-null FK values missing from the parent
    * key set (LEFT ANTI join on the FK — broadcast when the parent is a
    * dimension, shuffle-on-key otherwise; Catalyst/AQE picks).
    * `checkName` defaults to referential_integrity_<fk>; embedding-table
    * routing reuses the same join as its id_join_back check. */
  def fkOrphanCheck(child: DataFrame, childName: String, fkCol: String,
      parent: DataFrame, parentKeyCol: String,
      checkName: Option[String] = None): DataFrame = {
    val orphans = child.select(col(fkCol)).filter(col(fkCol).isNotNull)
      .join(parent.select(col(parentKeyCol).as(fkCol)), Seq(fkCol), "left_anti")
    orphans.agg(count(lit(1)).cast("long").as("metric"))
      .select(
        lit(childName).as("table_name"),
        lit(checkName.getOrElse(s"referential_integrity_$fkCol")).as("check_name"),
        lit("error").as("severity"),
        (col("metric") === 0).as("passed"),
        col("metric"))
  }

  /** V16 dimension consistency as a check row: metric = number of
    * distinct embedding dimensions (groupBy(size) — no count_distinct
    * Expand); passes when ≤ 1. */
  def dimConsistencyCheck(df: DataFrame, tableName: String,
      vecCol: String = "embedding"): DataFrame =
    df.select(size(col(vecCol)).as("_d")).groupBy("_d").agg(count(lit(1)))
      .agg(count(lit(1)).cast("long").as("metric"))
      .select(
        lit(tableName).as("table_name"),
        lit("dim_consistency").as("check_name"),
        lit("error").as("severity"),
        (col("metric") <= 1).as("passed"),
        col("metric"))

  /** DEEP referential integrity over a child-ID array column: explode the
    * array and anti-join the child table's key (the check the reference
    * stubs out with a null test — checks.py:496-498 "would need to be
    * checked against the utterances table"). Also counts null arrays. */
  def childArrayOrphanCheck(parent: DataFrame, parentName: String, arrayCol: String,
      child: DataFrame, childKeyCol: String): DataFrame = {
    val exploded = parent.select(explode(col(arrayCol)).as("_cid"))
    val orphans = exploded
      .join(child.select(col(childKeyCol).as("_cid")), Seq("_cid"), "left_anti")
    val orphanRow = orphans.agg(count(lit(1)).cast("long").as("metric"))
      .select(
        lit(parentName).as("table_name"),
        lit(s"referential_orphans_$arrayCol").as("check_name"),
        lit("error").as("severity"),
        (col("metric") === 0).as("passed"),
        col("metric"))
    val nullRow = parent.agg(cnt(col(arrayCol).isNull).cast("long").as("metric"))
      .select(
        lit(parentName).as("table_name"),
        lit(s"referential_integrity_$arrayCol").as("check_name"),
        lit("error").as("severity"),
        (col("metric") === 0).as("passed"),
        col("metric"))
    orphanRow.unionByName(nullRow)
  }

  /** Strip nullability (and array/map containsNull) recursively: parquet
    * round-trips everything back nullable, and the reference's schema
    * check tolerates that (schemas.py:158-163) — only SHAPE mismatches
    * are violations. */
  private def shapeOf(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(shapeOf(e), containsNull = true)
    case MapType(k, v, _) => MapType(shapeOf(k), shapeOf(v), valueContainsNull = true)
    case StructType(fs) =>
      StructType(fs.map(f => f.copy(dataType = shapeOf(f.dataType), nullable = true)))
    case other => other
  }

  /** Schema compliance: required fields present with compatible types
    * (checks.py:150-228). Driver-side — schemas are metadata. */
  def schemaChecks(df: DataFrame, spec: TableSpec, expected: StructType): DataFrame = {
    val actual = df.schema.fields.map(f => f.name -> shapeOf(f.dataType)).toMap
    val missing = expected.fields.count(f => !actual.contains(f.name))
    val mistyped = expected.fields.count(f =>
      actual.get(f.name).exists(_ != shapeOf(f.dataType)))
    val spark = df.sparkSession
    import spark.implicits._
    Seq(
      (spec.name, "required_fields", "error", missing == 0, missing.toLong),
      (spec.name, "schema_compliance", "error", mistyped == 0, mistyped.toLong))
      .toDF("table_name", "check_name", "severity", "passed", "metric")
  }

  /** Full check suite for one table (against its related tables).
    * `enabled` is the routed check-family set (None = run everything):
    * families are ids/numerics/timestamps/text/duplicates/referential
    * for base tables and dim_consistency/id_join_back for embedding
    * tables (F12; config/validator_routing.yaml's per-role lists). */
  def validateTable(df: DataFrame, spec: TableSpec,
      related: Map[String, DataFrame] = Map.empty,
      expectedSchema: Option[StructType] = None,
      enabled: Option[Set[String]] = None): DataFrame = {
    def on(family: String): Boolean = enabled.forall(_.contains(family))
    val parts = Seq.newBuilder[DataFrame]
    // referential-routed FKs take the fused key-space path (one child
    // exchange for cardinality + orphans)
    val fkFusion: Seq[(String, String, String)] =
      if (on("referential")) spec.foreignKeys else Nil
    parts += counterChecks(df, spec, enabled, skipFkCardinality = fkFusion.nonEmpty)
    expectedSchema.foreach(s => parts += schemaChecks(df, spec, s))
    fkFusion.foreach { case (fk, parentName, parentKey) =>
      parts ++= fusedKeyChecks(df, spec, fk, related.get(parentName), parentKey)
    }
    if (!on("referential") && on("id_join_back"))
      spec.foreignKeys.foreach { case (fk, parentName, parentKey) =>
        related.get(parentName).foreach { parent =>
          // embedding-role tables route this join as their id_join_back
          parts += fkOrphanCheck(df, spec.name, fk, parent, parentKey,
            Some(s"id_join_back_$fk"))
        }
      }
    if (on("referential"))
      spec.childArrays.foreach { case (arr, childName, childKey) =>
        related.get(childName).foreach { child =>
          parts += childArrayOrphanCheck(df, spec.name, arr, child, childKey)
        }
      }
    // only when explicitly routed: unrouted validateAll keeps its exact
    // historical check set (q49's oracle contract)
    if (enabled.exists(_.contains("dim_consistency")) && df.columns.contains("embedding"))
      parts += dimConsistencyCheck(df, spec.name)
    parts.result().reduce(_.unionByName(_))
  }

  /** Validate a set of tables against their specs; FK/child references
    * resolve within the set. Returns all check rows, deterministically
    * ordered. With `routing`, each table runs only the checks its role
    * enables (unrouted tables run everything, like the reference). */
  def validateAll(tables: Map[String, DataFrame], specs: Seq[TableSpec],
      expectedSchemas: Map[String, StructType] = Map.empty,
      routing: Option[graft.quality.Guardrails.Routing] = None): DataFrame =
    specs.map { spec =>
      validateTable(tables(spec.name), spec, tables - spec.name,
        expectedSchemas.get(spec.name),
        routing.flatMap(_.tableChecks(spec.name)))
    }.reduce(_.unionByName(_))
      .orderBy("table_name", "check_name")

  /** The lakehouse's own artifact tables wired with their PK/FK/child-array
    * constraints (schemas.py:12-93; ids are C3's deterministic IDs). */
  def lakehouseSpecs: Seq[TableSpec] = Seq(
    TableSpec("utterances", primaryKeys = Seq(Seq("utterance_id"))),
    TableSpec("spans",
      primaryKeys = Seq(Seq("span_id")),
      foreignKeys = Seq(("episode_id", "utterances", "episode_id")),
      childArrays = Seq(("utterance_ids", "utterances", "utterance_id"))),
    TableSpec("beats",
      primaryKeys = Seq(Seq("beat_id")),
      childArrays = Seq(("span_ids", "spans", "span_id"))),
    TableSpec("sections",
      primaryKeys = Seq(Seq("section_id")),
      childArrays = Seq(("beat_ids", "beats", "beat_id"))),
    TableSpec("embeddings", primaryKeys = Seq(Seq("artifact_id"))))

  /** Summary counts (reference ValidationReport.summary, checks.py:98-119). */
  def summarize(checks: DataFrame): DataFrame =
    checks.agg(
      count(lit(1)).as("total_checks"),
      cnt(col("passed")).as("passed_checks"),
      cnt(!col("passed")).as("failed_checks"),
      cnt(!col("passed") && col("severity") === "error").as("errors"),
      cnt(!col("passed") && col("severity") === "warning").as("warnings"))
}
