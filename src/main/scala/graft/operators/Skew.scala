package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins and aggregations.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime, but it cannot help when one key dominates a hash aggregate or
  * when the join already chose its strategy. Salting is the explicit
  * fix: spread each hot key over `nSalts` sub-keys, replicate the small
  * side once per salt, and the hot partition becomes `nSalts` even ones.
  * Cost model: the small side is shipped `nSalts`× (it was broadcast-
  * sized anyway), the big side gains one column — a good trade whenever
  * one reducer would otherwise run `nSalts`× longer than the rest.
  */
object Skew {

  /** Equi-join `big ⨝ small` on `key`, salted: big rows get a
    * deterministic salt in [0, nSalts), small rows are replicated across
    * all salts. Result equals the unsalted inner join. */
  private val SaltableJoinTypes = Set(
    "inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
    "left_anti", "leftanti")

  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    // right/full outer would emit one row PER SALT REPLICA for unmatched
    // small-side keys — silently inflated output. Only join types that
    // never preserve unmatched small-side rows are salt-safe.
    require(SaltableJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin does not support '$joinType': unmatched small-side rows would " +
        "be duplicated once per salt (use inner/left/left_semi/left_anti)")
    // deterministic salt (hash of the row's key + a spread column would
    // collapse same-key rows to one salt; use a stable per-row spread)
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(nSalts)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase skew-proof aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. Use for aggregates that re-combine
    * (sum/count/min/max): a key with 10^9 rows becomes nSalts partial
    * rows before the final shuffle. (Spark's hash aggregate already does
    * map-side partials; explicit salting matters when upstream
    * repartitioning defeats them — e.g. after a join on the same key.) */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    df.withColumn("_salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(nSalts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum(col("_s")).as(s"sum_$valueCol"), sum(col("_n")).as("n"))
  }

  /** Per-key row counts — the cheap skew probe to run before choosing
    * `nSalts` (top-k hottest keys). */
  def hotKeys(df: DataFrame, key: String, topK: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(key)).limit(topK)
}
