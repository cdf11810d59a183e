package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data-layout control for scan-time pruning: Z-order (Morton)
 * clustering on two integer keys, so Parquet row-group/file min-max
 * statistics become selective for BOTH keys at once (the
 * Delta/Iceberg `OPTIMIZE ZORDER BY` recipe, built from plain Spark
 * primitives — no table format required).
 *
 * Why it matters at 100 TB: sorting by `(a, b)` makes min-max stats
 * selective for `a` only — a predicate on `b` alone still scans every
 * file. Interleaving the key bits makes files cover small RECTANGLES
 * of the (a, b) key space, so a conjunctive range predicate on either
 * or both keys skips everything outside its rectangle; Spark pushes
 * the range filters to the Parquet reader (`PushedFilters` in the
 * scan node) which drops whole row groups on stats alone — the data
 * never leaves disk.
 *
 * The z column is computed with codegen'd bitwise builtins (the
 * classic mask-shift bit spread — no UDF, no expression fallback) and
 * `repartitionByRange` gives disjoint per-file z ranges (RangePartitioner
 * samples boundaries distributedly; LayoutSpec asserts the written
 * files' z ranges do not overlap, which is the pruning precondition).
 *
 * Same-named geometry variant: `rf_z2_index`
 * ([[graft.expressions.Z2Index]]) does this for lon/lat centroids; this
 * one is for arbitrary integer dimension keys.
 */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (Morton
    * half-interleave): `abcd` → `0a0b0c0d`, as a codegen'd expression. */
  private def spread16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton/Z2 interleave of two non-negative integer keys (16 bits
    * each — divide coarser keys down first; pruning needs locality, not
    * exact ranks). */
  def zIndex(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** Write `df` as `files` Parquet files z-ordered on `(keyA, keyB)`:
    * range-partitioned by the interleaved index, sorted within each
    * file, index column dropped (it is derivable; the pruning filters
    * are on the original key columns' stats). */
  def zorderWrite(df: DataFrame, keyA: String, keyB: String, path: String,
      files: Int = 16): Unit = {
    df.withColumn("__graft_z", zIndex(col(keyA), col(keyB)))
      .repartitionByRange(files, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Hilbert interleave of two non-negative integer keys (16 bits
    * each) — [[zIndex]]'s locality-first twin: consecutive index values
    * are always grid-adjacent, so range-partitioned files cover tighter
    * key-space rectangles than Z-order's seam-jumping cells (fewer
    * files straddle a range predicate's rectangle ⇒ better min-max
    * pruning on the same stats). One scalar kernel node
    * ([[graft.expressions.HilbertKeyIndex]]). */
  def hilbertIndex(a: Column, b: Column): Column = {
    import graft.expressions.{asColumn, asExpr}
    asColumn(graft.expressions.HilbertKeyIndex(
      asExpr(a.cast("long")), asExpr(b.cast("long"))))
  }

  /** [[zorderWrite]] with the Hilbert interleave: `files` Parquet files
    * range-partitioned and sorted by the Hilbert index of
    * `(keyA, keyB)`, index dropped after layout. */
  def hilbertWrite(df: DataFrame, keyA: String, keyB: String, path: String,
      files: Int = 16): Unit = {
    df.withColumn("__graft_h", hilbertIndex(col(keyA), col(keyB)))
      .repartitionByRange(files, col("__graft_h"))
      .sortWithinPartitions("__graft_h")
      .drop("__graft_h")
      .write.mode("overwrite").parquet(path)
  }

  /**
   * Hash-shard balance audit — the layout-planning question a 100 TB
   * corpus asks before choosing its shard count: assign every row to
   * `shard = mix64(id) & (shards − 1)` (splitmix64 then mask; `shards`
   * must be a power of two so the mask equals the unsigned modulus and
   * any engine — including the DuckDB HUGEINT oracle — reproduces the
   * assignment exactly) and report per-shard row count, weight sum
   * (bytes, tokens — caller's column), and the signed permille
   * deviation from the ideal even split,
   * `dev_permille = (w_sum·shards·1000) div Σw − 1000` (nonnegative
   * weights, so `div` truncation is floor on the positive side and the
   * −1000 shift carries the sign).
   *
   * Scale shape: ONE map-side-combinable groupBy on the masked hash
   * (shards rows out), then the one-row total rides a broadcast
   * crossJoin — the same bounded-totals pattern as
   * [[Stats.collocations]]. Output: `shard, n_rows, w_sum,
   * dev_permille`.
   */
  def shardBalance(df: DataFrame, idCol: String, weight: Column,
      shards: Int = 256): DataFrame = {
    require(shards >= 2 && (shards & (shards - 1)) == 0,
      s"shards must be a power of two >= 2, got $shards")
    // A non-numeric id would cast to NULL and pool silently into a
    // NULL shard, skewing the audit — require a long-compatible type
    // up front so a bad id column fails loudly at plan time.
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long", "date", "timestamp")
        .contains(idType.typeName) || idType.typeName.startsWith("decimal"),
      s"shardBalance needs an integral id column; '$idCol' is " +
        s"${idType.simpleString} (hash raw bytes or pre-parse instead)")
    import graft.expressions.asColumn
    import graft.expressions.asExpr
    val shard = asColumn(graft.pipeline.Mix64(asExpr(col(idCol).cast("long"))))
      .bitwiseAND(lit(shards - 1L)).as("shard")
    val perShard = df.select(shard, weight.cast("long").as("__w"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum("__w").as("w_sum"))
    val tot = perShard.agg(sum("w_sum").as("__tot"))
    perShard.crossJoin(broadcast(tot))
      .withColumn("dev_permille",
        expr(s"w_sum * ${shards}L * 1000 div __tot - 1000"))
      .drop("__tot")
  }
}
