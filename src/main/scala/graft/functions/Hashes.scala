package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash functions for dedup/fingerprinting (reference: content-addressed
  * IDs, src/lakehouse/ids.py:14-53; near-dup keys, integrity.py:460-519).
  *
  * Two families:
  *  - [[polyHash]]: polynomial rolling hash over character codes, mod
  *    1e9+7. Weaker mixing, but exactly replicable in SQL engines
  *    (`list_reduce` fold) — used by the oracle-checked dedup queries so
  *    the *entire* MinHash/SimHash pipeline is cross-engine verifiable.
  *  - [[fastHash]]: xxhash64 — the production path at scale (codegen'd,
  *    one call per value instead of a per-char fold).
  */
object Hashes {

  val PolyMod: Long = 1000000007L
  val PolyMul: Long = 131L

  /** Second, INDEPENDENT poly-hash family for two-factor fingerprints
    * ([[graft.pipeline.CuratePipeline]]'s normFp). Different multiplier
    * AND different prime modulus, so a collision in the [[polyHash]]
    * factor says nothing about this one — the earlier
    * `polyHash(concat("x", s))` variant was affinely related to
    * `polyHash(s)` for equal-length inputs (h("x"+s) = (h("x")·131^len(s)
    * + h(s)) mod p), collapsing the pack's effective entropy to ~30 bits
    * per length class. */
  val PolyMod2: Long = 998244353L
  val PolyMul2: Long = 137L

  /** Second-level multiplier folding TOKEN hashes into positional k-gram
    * hashes (rolling-window chain, [[graft.expressions.HashKernels.gramChain]]).
    * Distinct from [[PolyMul]] so a k-gram of single-char tokens can't
    * collide with a plain string hash by construction. */
  val SpanGramMul: Long = 1000003L

  /** Fold characters: acc = (acc * 131 + code) % 1e9+7, acc0 = 0.
    * Empty-safe: empty string hashes to 0. Works on code points (ASCII
    * and BMP); the oracle side uses DuckDB `unicode()` identically.
    *
    * Codegen kernel (eagerly bound — no registry): the previous
    * aggregate(transform(filter(split(s,"")))) HOF formulation
    * interpreted three lambda frames PER CHARACTER of every hashed
    * string; [[graft.expressions.HashKernels.polyHash]] is one static
    * call per row with identical values (KernelProps pins equality). */
  def polyHash(s: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.expressions.PolyHashExpr(ColumnShim.expression(s)))
  }

  /** The independent second factor: acc = (acc * 137 + code) % 998244353.
    * Same fold shape as [[polyHash]], different multiplier and modulus. */
  def polyHash2(s: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(graft.expressions.PolyHash2Expr(ColumnShim.expression(s)))
  }

  /** SQL (DuckDB) rendering of [[polyHash]] over an arbitrary expression —
    * the single source of truth for oracle parity. */
  def polyHashSql(e: String): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(list_filter(string_split($e, ''), c -> length(c) > 0), " +
      "c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, c) -> (acc * $PolyMul + c) % $PolyMod)"

  /** SQL (DuckDB) rendering of [[polyHash2]] — oracle parity twin. */
  def polyHash2Sql(e: String): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(list_filter(string_split($e, ''), c -> length(c) > 0), " +
      "c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, c) -> (acc * $PolyMul2 + c) % $PolyMod2)"

  /** Seeded production hash (NOT SQL-replicable). */
  def fastHash(s: Column, seed: Int): Column = xxhash64(lit(seed), s)
}
