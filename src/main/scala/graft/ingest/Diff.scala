package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change data feed between two committed versions of a layer — the
  * "what changed since vN" question every downstream consumer of a
  * merged/compacted table asks. Computed relationally from the two
  * version reads (merge chains resolve transparently via
  * [[Layout.loadVersion]]): full-row hashes classify each key as
  * inserted / deleted / updated / unchanged, so the diff costs two scans
  * and one keyed join — no per-version row-level logs to maintain.
  *
  * At 100 TB the two scans prune like any other read (partition
  * filters push through `loadVersion`), and the join shuffles once on
  * the key. Unchanged rows can be excluded from the output
  * (`includeUnchanged = false`, the default) so the result is change-
  * sized, not table-sized.
  */
object Diff {

  /** Rows changed from `fromVersion` to `toVersion`, tagged with
    * `_change` ∈ insert | delete | update (| unchanged). Row identity is
    * `keys` — which must be UNIQUE per version (the layer's primary key,
    * the same contract [[Merge.merge]] upserts by); duplicate keys would
    * cross-multiply through the full-outer join. Row equality is a hash
    * over all NON-key columns (listed sorted, so column order never
    * matters). Output columns are the `toVersion` row for
    * inserts/updates, the `fromVersion` row for deletes. */
  def changes(spark: SparkSession, base: String, layer: String,
      fromVersion: Int, toVersion: Int, keys: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    val from = Layout.loadVersion(spark, base, layer, fromVersion)
    val to = Layout.loadVersion(spark, base, layer, toVersion)
    require(from.columns.sorted.sameElements(to.columns.sorted),
      s"schemas differ between v$fromVersion and v$toVersion: " +
        s"${from.columns.mkString(",")} vs ${to.columns.mkString(",")}")

    val valueCols = from.columns.filterNot(keys.contains).sorted.toSeq
    def hashed(df: DataFrame, tag: String): DataFrame =
      df.withColumn(s"_h_$tag",
        if (valueCols.isEmpty) lit(0L) else xxhash64(valueCols.map(col): _*))

    val f = hashed(from, "from")
    val t = hashed(to, "to")
    val joined = f.select((keys :+ s"_h_from").map(col): _*)
      .join(t, keys, "full_outer")

    val tagged = joined.withColumn("_change",
      when(col("_h_from").isNull, lit("insert"))
        .when(col("_h_to").isNull, lit("delete"))
        .when(col("_h_from") =!= col("_h_to"), lit("update"))
        .otherwise(lit("unchanged")))

    // deletes have no `to` row — re-attach the from-side values for them
    val withDeletes = tagged
      .filter(col("_change") =!= "delete")
      .unionByName(
        tagged.filter(col("_change") === "delete")
          .select((keys :+ "_change").map(col): _*)
          .join(from, keys)
          .withColumn("_h_from", lit(null).cast("long"))
          .withColumn("_h_to", lit(null).cast("long")),
        allowMissingColumns = true)

    val out = withDeletes.drop("_h_from", "_h_to")
    (if (includeUnchanged) out else out.filter(col("_change") =!= "unchanged"))
      .select((from.columns.toSeq :+ "_change").map(col): _*)
  }
}
