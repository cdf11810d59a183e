package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deequ-style column profiling: per-column row/null/distinct counts and
 * min/max, as ROWS (one per column) — the data-quality summary a
 * pipeline materializes next to every snapshot it publishes, and diffs
 * across snapshots to catch silent upstream drift (the exact failure
 * mode that broke graft's own round 9: an unannounced `events.ts`
 * type change).
 *
 * One pass over the data: a single global aggregation computes every
 * column's metrics (Catalyst plans the N distinct-counts with one
 * Expand ×(cols+1) — the standard multi-distinct shape; at extreme
 * widths profile column batches separately), then a `stack` unpivots
 * the 1-row result to (column, metric...) rows driver-side-free.
 *
 * min/max are reported as strings so one schema fits every column
 * type. Deterministic for integral/string/date columns; profiling
 * FLOAT columns is supported but their min/max string rendering is
 * engine-specific (Java `Double.toString` vs C printf) — keep floats
 * out when hash-exact cross-engine parity matters (q_profile does).
 */
object Profile {

  /** One row per profiled column: `column`, `n_rows`, `n_non_null`,
    * `n_distinct` (exact, nulls excluded), `min_value`, `max_value`
    * (string-cast). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols required")
    val aggs = count(lit(1)).as("__graft_total") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__graft_cnt_$c"),
        countDistinct(col(c)).as(s"__graft_nd_$c"),
        min(col(c)).cast("string").as(s"__graft_min_$c"),
        max(col(c)).cast("string").as(s"__graft_max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val tuples = cols.map { c =>
      s"'$c', __graft_total, `__graft_cnt_$c`, `__graft_nd_$c`, " +
        s"`__graft_min_$c`, `__graft_max_$c`"
    }.mkString(", ")
    row.select(expr(s"stack(${cols.size}, $tuples) AS " +
      "(column, n_rows, n_non_null, n_distinct, min_value, max_value)"))
  }
}
