package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of pre-aggregated tables — the materialized-
  * view pattern that keeps a 100 TB history out of every refresh: the
  * aggregate state lives as a keyed table of MERGEABLE parts
  * (sum/count/min/max; avg derives as sum/count at read), each append
  * batch is aggregated alone, and the two states merge with one keyed
  * agg over `existing ∪ batchAgg` — cost proportional to the BATCH and
  * the touched keys, never to history.
  *
  * Column naming is the contract: `<col>_sum`, `<col>_count`,
  * `<col>_min`, `<col>_max` (plus the global `rows` count). [[merge]]
  * re-derives the merge function from the suffix, so state tables are
  * self-describing and survive checkpoint/restart as plain parquet.
  */
object IncrementalAgg {

  final case class Spec(column: String, funcs: Seq[String]) {
    require(funcs.nonEmpty && funcs.forall(Set("sum", "count", "min", "max")),
      s"mergeable funcs are sum/count/min/max; got $funcs")
  }

  private def aggColumns(specs: Seq[Spec]): Seq[Column] =
    count(lit(1)).as("rows") +: specs.flatMap { s =>
      s.funcs.map {
        case "sum"   => sum(col(s.column)).as(s"${s.column}_sum")
        case "count" => count(col(s.column)).as(s"${s.column}_count")
        case "min"   => min(col(s.column)).as(s"${s.column}_min")
        case "max"   => max(col(s.column)).as(s"${s.column}_max")
      }
    }

  /** Aggregate one batch into mergeable state. */
  def aggregate(batch: DataFrame, keys: Seq[String], specs: Seq[Spec]): DataFrame = {
    val aggs = aggColumns(specs)
    batch.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two state tables (same schema) into one: sums and counts add,
    * mins/maxes fold. */
  def merge(existing: DataFrame, freshAgg: DataFrame, keys: Seq[String]): DataFrame = {
    require(existing.columns.sorted.sameElements(freshAgg.columns.sorted),
      s"state schemas differ: ${existing.columns.mkString(",")} vs ${freshAgg.columns.mkString(",")}")
    val stateCols = existing.columns.filterNot(keys.contains)
    val merged = stateCols.toSeq.map { c =>
      val f: Column => Column =
        if (c == "rows" || c.endsWith("_sum") || c.endsWith("_count")) sum
        else if (c.endsWith("_min")) min
        else if (c.endsWith("_max")) max
        else throw new IllegalArgumentException(
          s"column '$c' has no mergeable suffix (_sum/_count/_min/_max/rows)")
      f(col(c)).as(c)
    }
    existing.unionByName(freshAgg)
      .groupBy(keys.map(col): _*).agg(merged.head, merged.tail: _*)
  }

  /** One maintenance step: aggregate the new batch and fold it into the
    * existing state (empty/None state bootstraps from the batch alone). */
  def refresh(existing: Option[DataFrame], batch: DataFrame,
      keys: Seq[String], specs: Seq[Spec]): DataFrame = {
    val fresh = aggregate(batch, keys, specs)
    existing match {
      case Some(st) => merge(st, fresh, keys)
      case None     => fresh
    }
  }
}
