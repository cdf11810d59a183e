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
 * Shape: one branch per column, each a two-phase `groupBy(value)` →
 * global fold — NO multi-distinct Expand. A single aggregate with N
 * `countDistinct`s makes Catalyst Expand the scan ×(N+1) and push
 * every replicated row through one wide hash aggregate (measured 7×
 * the per-column cost at sf0.1); per-column branches instead get a
 * map-side partial `groupBy(value)` (combining duplicates before the
 * shuffle, so only DISTINCT values travel), and against a columnar
 * source each branch's scan is pruned to its own column, so the
 * union reads the same total bytes as one all-column scan. The
 * global fold over distinct values computes every metric in one
 * pass: n_rows = Σcnt, n_distinct = count of non-null groups,
 * min/max over group keys. Profile a non-source DataFrame (computed,
 * unpersisted) through `.cache()` first — the branches re-evaluate
 * their input.
 *
 * min/max are reported as strings so one schema fits every column
 * type (ordering is computed on the NATIVE type, only the result is
 * string-cast). Deterministic for integral/string/date columns;
 * profiling FLOAT columns is supported but their min/max string
 * rendering is engine-specific (Java `Double.toString` vs C printf) —
 * keep floats out when hash-exact cross-engine parity matters
 * (q_profile does).
 */
object Profile {

  /** One row per profiled column: `column`, `n_rows`, `n_non_null`,
    * `n_distinct` (exact, nulls excluded), `min_value`, `max_value`
    * (string-cast). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols required")
    cols.map { c =>
      df.groupBy(col(c).as("__graft_v"))
        .agg(count(lit(1)).as("__graft_cnt"))
        .agg(
          coalesce(sum(col("__graft_cnt")), lit(0L)).as("n_rows"),
          coalesce(sum(when(col("__graft_v").isNotNull, col("__graft_cnt"))),
            lit(0L)).as("n_non_null"),
          count(col("__graft_v")).as("n_distinct"),
          min(col("__graft_v")).cast("string").as("min_value"),
          max(col("__graft_v")).cast("string").as("max_value"))
        .select(lit(c).as("column"), col("n_rows"), col("n_non_null"),
          col("n_distinct"), col("min_value"), col("max_value"))
    }.reduce(_ unionAll _)
  }
}
