package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins the built-in operators can't express directly: as-of
 * (merge-asof / point-in-time) join and interval (point-in-span) join.
 *
 * Both are composed from stock shuffles so Catalyst keeps optimizing
 * around them, and both are written for the 100 TB case:
 *
 *  - [[asofJoin]] is ONE shuffle total — a union of the two inputs
 *    sorted per key — instead of the naive theta-join
 *    (`l.ts >= r.ts` forces a broadcast-nested-loop plan whose refine
 *    step is quadratic per key). State per key is a single running
 *    "latest right row", so a key with millions of rows streams through
 *    the window operator without materializing pairs.
 *  - [[intervalJoin]] maps each point to exactly ONE time bucket and
 *    each span to the buckets it overlaps, then equi-joins on
 *    (key, bucket) and refines with the exact containment predicate.
 *    Every qualifying pair meets in exactly one bucket (the point's),
 *    so no dedup pass is needed. Shuffle volume is |points| +
 *    Σ spans×⌈span/width⌉ rows — linear, never the |points|×|spans|
 *    cross product a BNLJ range join produces.
 *
 * The reference engine has no temporal-join surface (its joins are
 * spatial — `extensions/RasterJoin.scala`); these follow the same
 * design recipe as [[graft.RasterJoin.bucketed]]: turn a theta
 * predicate into an equi-key the data can shuffle on.
 */
object Temporal {

  /**
   * As-of join: for every left row, attach the single right row of the
   * same key with the greatest `rightTs <= leftTs` (pandas
   * `merge_asof(direction="backward", allow_exact_matches=True)`).
   *
   * Output = all left columns, plus each non-key right column prefixed
   * with `rightPrefix` (including the matched right timestamp). Rows
   * with no qualifying match keep null right columns (left-outer).
   *
   * `tolerance`: optional maximum for `leftTs - rightTs`; matches
   * farther in the past are nulled out. Pass a literal in the timestamp
   * columns' own algebra — `lit(600000000L)` for long micros,
   * `expr("INTERVAL '10' MINUTE")` for TIMESTAMP columns.
   *
   * Determinism: if several right rows share the matched (key, ts), the
   * one with the greatest payload struct wins (a total order, so plans
   * and engines agree). Pre-aggregate the right side to unique
   * (key, ts) if another tie-break is wanted.
   *
   * Algorithm: tag right rows side=0, left rows side=1, union, and take
   * `last(right_payload, ignoreNulls)` over
   * `Window.partitionBy(key).orderBy(ts, side, payload)` — right rows
   * sort before left rows at equal ts, so exact matches are included.
   * One shuffle; per-key state is one struct.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPrefix: String = "right_",
      tolerance: Option[Column] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    require(payloadCols.contains(rightTs), s"right is missing ts column $rightTs")
    val r = right.select(
      col(key).as("__graft_k"), col(rightTs).as("__graft_ts"),
      lit(0).as("__graft_side"),
      struct(payloadCols.map(col): _*).as("__graft_r"))
    val l = left
      .withColumn("__graft_k", col(key))
      .withColumn("__graft_ts", col(leftTs))
      .withColumn("__graft_side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("__graft_k")
      .orderBy(col("__graft_ts"), col("__graft_side"), col("__graft_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__graft_r"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case Some(tol) =>
        when(matchedRaw.isNotNull &&
          col("__graft_ts") - matchedRaw(rightTs) <= tol, matchedRaw)
      case None => matchedRaw
    }
    u.withColumn("__graft_m", matched)
      .where(col("__graft_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(c => col("__graft_m")(c).as(rightPrefix + c)): _*)
  }

  /**
   * Interval join: every (point, span) pair of the same key with
   * `startCol <= tsCol < endCol` (half-open, the event-log convention).
   *
   * Output = all point columns, plus each span column prefixed with
   * `spanPrefix`. Inner semantics — aggregate and re-join to the span
   * table for left-outer counts (see q_interval_join).
   *
   * Timestamps must be NUMERIC (epoch micros via `unix_micros` for
   * TIMESTAMP columns): bucketing is integer floor-division.
   *
   * `bucketWidth` tuning: pick ≈ the typical span length, so each span
   * lands in O(1) buckets. Shuffle cost is |points| + Σ ⌈span/width⌉;
   * the exact predicate is applied after the equi-join, so any width
   * gives identical results (asserted by TemporalSpec) — width only
   * moves the duplication/selectivity trade-off. Skewed keys shuffle as
   * (key, bucket) composite keys, which already spreads a hot key
   * across its time range.
   */
  def intervalJoin(points: DataFrame, spans: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String, bucketWidth: Long,
      spanPrefix: String = "span_"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val spanCols = spans.columns.toSeq
    val p = points
      .withColumn("__graft_k", col(key))
      .withColumn("__graft_b", expr(s"CAST($tsCol AS BIGINT) div ${bucketWidth}L"))
    // one row per bucket the half-open span overlaps; empty spans vanish
    val sp = spans
      .where(col(endCol) > col(startCol))
      .select(col(key).as("__graft_k"),
        explode(sequence(
          expr(s"CAST($startCol AS BIGINT) div ${bucketWidth}L"),
          expr(s"(CAST($endCol AS BIGINT) - 1) div ${bucketWidth}L"))).as("__graft_b"),
        struct(spanCols.map(col): _*).as("__graft_s"))
    p.join(sp, Seq("__graft_k", "__graft_b"))
      .where(col(tsCol) >= col("__graft_s")(startCol) &&
        col(tsCol) < col("__graft_s")(endCol))
      .select(points.columns.toIndexedSeq.map(col) ++
        spanCols.map(c => col("__graft_s")(c).as(spanPrefix + c)): _*)
  }
}
