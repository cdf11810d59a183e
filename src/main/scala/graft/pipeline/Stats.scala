package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distribution-based outlier screening — the per-group z-score gate a
 * curation pipeline runs over metric columns (request latencies, doc
 * quality scores, per-domain token counts) before training on them.
 *
 * Everything is EXACT INTEGER math on a pre-scaled long metric: the
 * z-test `|v − μ| > k·σ` is algebraically cleared of divisions to
 *
 *   kDen²·(n·v − s)² > kNum²·(n·ssq − s²),   s = Σv, ssq = Σv²
 *
 * so there is no float accumulation anywhere — the flag is
 * bit-reproducible under any partitioning / aggregation order, and the
 * DuckDB oracle (q_anomaly) replays it verbatim. Rational `k`
 * (kNum/kDen) covers the usual 1.5σ/2σ/3σ gates without touching
 * floats.
 *
 * Scale shape: one `groupBy(keys)` for the moment table (map-side
 * combine ⇒ one row per key per partition before the exchange), then
 * an equi-join back — the moment table is |keys| rows, so AQE
 * broadcast-joins it in practice; nothing shuffles the fact table a
 * second time and no window sort is involved.
 *
 * Overflow bound (documented contract, asserted per row): with
 * `V = max|v|` and `N = max group size`, the products need
 * `kNum²·N·V² < 2^63` — e.g. centi-scaled metrics to 10^6 with
 * million-row groups at k=3. Pre-scale coarser (deci/unit) for wider
 * regimes.
 */
object Stats {

  /**
   * Append group moments and the z-gate flag to every row:
   * `grp_n`, `dev2 = (n·v − s)²`, `var_n2 = n·ssq − s²` (= n²σ²), and
   * `is_anomaly = kDen²·dev2 > kNum²·var_n2`. Rows in singleton groups
   * have `var_n2 = 0` and never flag (z is undefined; the gate is
   * strict). `valueCol` must be integral (pre-scale floats first).
   */
  def anomalyFlags(df: DataFrame, keys: Seq[String], valueCol: String,
      kNum: Int = 2, kDen: Int = 1): DataFrame = {
    require(keys.nonEmpty, "keys required")
    require(kNum > 0 && kDen > 0, s"k must be positive, got $kNum/$kDen")
    val v = col(valueCol).cast("long")
    val moments = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("grp_n"),
      sum(v).as("__graft_s"),
      sum(v * v).as("__graft_ssq"))
    df.join(moments, keys)
      .withColumn("dev2", {
        val d = col("grp_n") * v - col("__graft_s")
        d * d
      })
      .withColumn("var_n2",
        col("grp_n") * col("__graft_ssq") - col("__graft_s") * col("__graft_s"))
      .withColumn("is_anomaly",
        lit(kDen.toLong * kDen) * col("dev2") > lit(kNum.toLong * kNum) * col("var_n2"))
      .drop("__graft_s", "__graft_ssq")
  }

  /**
   * Two-sided CUSUM change-point detection over per-key ordered
   * series: the classic sequential statistic
   *
   *   S⁺_t = max(0, S⁺_{t−1} + (x_t − ref − slack))
   *   S⁻_t = max(0, S⁻_{t−1} + (ref − x_t − slack))
   *
   * flagged when either exceeds `threshold`. The recurrence is NOT
   * expressed as a recursion: `max(0, ·)`-folded sums have the closed
   * form `S_t = P_t − min(0, min_{j≤t} P_j)` with `P` the plain prefix
   * sum of the drift-adjusted deltas — so both sides are a cumulative
   * sum plus a running min, two ordinary window passes over ONE
   * shuffle by `keys`. No per-key array collection, no UDF loop; a
   * 100 TB metric stream with million-bucket keys runs as a sorted
   * window scan. All integer math on a pre-scaled long `valueCol` —
   * bit-reproducible, and the DuckDB oracle (q_cusum) replays the same
   * two windows.
   *
   * Output: input rows + `cusum_hi`, `cusum_lo`, `is_change`.
   */
  def cusum(df: DataFrame, keys: Seq[String], orderCol: String,
      valueCol: String, ref: Long, slack: Long, threshold: Long): DataFrame = {
    require(keys.nonEmpty, "keys required")
    require(slack >= 0 && threshold > 0, "slack >= 0 and threshold > 0 required")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = col(valueCol).cast("long")
    val withP = df
      .withColumn("__graft_ph", sum(v - lit(ref) - lit(slack)).over(w))
      .withColumn("__graft_pl", sum(lit(ref) - v - lit(slack)).over(w))
    withP
      .withColumn("cusum_hi",
        col("__graft_ph") - least(lit(0L), min("__graft_ph").over(w)))
      .withColumn("cusum_lo",
        col("__graft_pl") - least(lit(0L), min("__graft_pl").over(w)))
      .withColumn("is_change",
        col("cusum_hi") > threshold || col("cusum_lo") > threshold)
      .drop("__graft_ph", "__graft_pl")
  }
}
