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
   * A timestamp-ish column as epoch micros (long), schema-adaptively:
   *
   *  - `TIMESTAMP` → `unix_micros`
   *  - `TIMESTAMP_NTZ` → cast to `TIMESTAMP` (interpreted in the
   *    session timezone — graft sessions pin UTC) then `unix_micros`
   *  - numeric → `CAST(... AS BIGINT)` unchanged: the caller's own
   *    epoch algebra (micros, millis, a logical tick counter) passes
   *    through untouched
   *
   * This is the single point where every temporal operator (and every
   * SparkEntry temporal query) resolves its time axis, so a testdata
   * regeneration that flips `events.ts` between TIMESTAMP(NANOS)-as-
   * long and TIMESTAMP(MICROS) — which broke five queries in round 9 —
   * is absorbed here instead of failing analysis in each caller.
   */
  def epochMicros(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(c))
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(col(c).cast(org.apache.spark.sql.types.TimestampType))
      case _: org.apache.spark.sql.types.NumericType => col(c).cast("long")
      case other => throw new IllegalArgumentException(
        s"column $c: expected TIMESTAMP, TIMESTAMP_NTZ or numeric epoch, got $other")
    }

  /**
   * As-of join: for every left row, attach the single right row of the
   * same key with the greatest `rightTs <= leftTs` (pandas
   * `merge_asof(direction="backward", allow_exact_matches=True)`).
   * `direction = "forward"` matches the smallest `rightTs >= leftTs`
   * (the same single-shuffle window read in reverse time order);
   * `"nearest"` picks whichever of the two sits closer, ties backward
   * — still one shuffle, one extra in-partition sort.
   * `allowExactMatches = false` makes both comparisons strict, like
   * the pandas flag.
   *
   * Output = all left columns, plus each non-key right column prefixed
   * with `rightPrefix` (including the matched right timestamp). Rows
   * with no qualifying match keep null right columns (left-outer).
   *
   * Timestamp columns: `leftTs`/`rightTs` may be TIMESTAMP,
   * TIMESTAMP_NTZ or numeric epoch values, mixed freely — both sides
   * are normalized to epoch micros via [[epochMicros]] before the sort.
   * Right payload columns keep their original types in the output.
   *
   * `tolerance`: optional maximum for the match gap (`leftTs - rightTs`
   * backward, `rightTs - leftTs` forward) in the NORMALIZED domain —
   * micros for TIMESTAMP inputs (`lit(600000000L)` = 10 min), the
   * columns' own units for numeric inputs. Matches farther away null
   * out.
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
   *
   * SKEW BOUND: the window partitions by the bare key, so ALL rows of
   * one key stream through a single task — inherent to asof ordering,
   * fine for keys up to tens of millions of rows (the state is one
   * struct and the stream never materializes), but a single
   * billion-row hot key serializes. For that shape use
   * [[asofJoinBucketed]], which splits each key's window across coarse
   * time buckets with identical results.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightPrefix: String = "right_",
      tolerance: Option[Column] = None,
      direction: String = "backward",
      allowExactMatches: Boolean = true): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got $direction")
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    require(payloadCols.contains(rightTs), s"right is missing ts column $rightTs")
    // __graft_ots rides inside the payload struct so tolerance can
    // subtract in the normalized micros domain even when the visible
    // rightTs column is TIMESTAMP-typed; it is dropped on projection.
    // __graft_ord controls exact-match inclusion: rights sort before
    // lefts at equal ts (ord 0 < 1) when exact matches count, after
    // (ord 2 > 1) when they don't — the running last() then excludes
    // equal-ts rights in BOTH read directions.
    val r = right.select(
      col(key).as("__graft_k"), epochMicros(right, rightTs).as("__graft_ts"),
      lit(0).as("__graft_side"),
      lit(if (allowExactMatches) 0 else 2).as("__graft_ord"),
      struct(payloadCols.map(col) :+
        epochMicros(right, rightTs).as("__graft_ots"): _*).as("__graft_r"))
    val l = left
      .withColumn("__graft_k", col(key))
      .withColumn("__graft_ts", epochMicros(left, leftTs))
      .withColumn("__graft_side", lit(1))
      .withColumn("__graft_ord", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    // forward = the same running window over REVERSED time: rights with
    // later ts stream first, so the running last() at a left row is the
    // smallest rightTs >= leftTs. Payload stays ascending, so equal-ts
    // ties resolve to the greatest payload in every direction. Both
    // windows share one hash exchange; "nearest" costs a second sort of
    // the same partitions, never a second shuffle.
    def win(descTs: Boolean) = Window.partitionBy("__graft_k")
      .orderBy(if (descTs) col("__graft_ts").desc else col("__graft_ts").asc,
        col("__graft_ord"), col("__graft_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lazy val mB = last(col("__graft_r"), ignoreNulls = true).over(win(false))
    lazy val mF = last(col("__graft_r"), ignoreNulls = true).over(win(true))
    val matchedRaw = direction match {
      case "backward" => mB
      case "forward" => mF
      case "nearest" =>
        // smaller absolute gap wins; ties go backward (pandas nearest)
        val bg = col("__graft_ts") - mB("__graft_ots")
        val fg = mF("__graft_ots") - col("__graft_ts")
        when(mB.isNull, mF).when(mF.isNull, mB)
          .when(bg <= fg, mB).otherwise(mF)
    }
    val matched = tolerance match {
      case Some(tol) =>
        when(matchedRaw.isNotNull &&
          abs(col("__graft_ts") - matchedRaw("__graft_ots")) <= tol, matchedRaw)
      case None => matchedRaw
    }
    u.withColumn("__graft_m", matched)
      .where(col("__graft_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(c => col("__graft_m")(c).as(rightPrefix + c)): _*)
  }

  /**
   * Hot-key-safe variant of [[asofJoin]]: identical semantics for ANY
   * `bucketWidth` (asserted by TemporalSpec), with the per-key window
   * split into (key, ts div bucketWidth) time buckets so one hot key
   * parallelizes across its time range instead of serializing through
   * a single task.
   *
   * The carry-in — the latest right row strictly before each bucket's
   * start — is computed on a bounded per-(key, bucket) SUMMARY (one
   * max-struct row per bucket with right rows, plus the left side's
   * bucket universe). The only remaining serial-per-key step is a
   * window over that summary, whose length is the number of occupied
   * buckets per key, not the number of rows. The carry is injected
   * into each bucket as a virtual right row at the bucket start with
   * side −1, so it sorts before any real right row at the same
   * timestamp and real rows always win within their bucket.
   *
   * Timestamps may be TIMESTAMP/TIMESTAMP_NTZ (normalized to epoch
   * micros via [[epochMicros]] — `bucketWidth` and `tolerance` are then
   * in MICROS) or numeric non-negative epochs in the caller's own
   * units, like [[intervalJoin]] — bucketing is integer floor-division.
   * Pick `bucketWidth` so a hot key spreads across hundreds of buckets;
   * correctness never depends on the choice.
   */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, bucketWidth: Long,
      rightPrefix: String = "right_", tolerance: Option[Column] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    require(payloadCols.contains(rightTs), s"right is missing ts column $rightTs")
    val r = right.select(
      col(key).as("__graft_k"), epochMicros(right, rightTs).as("__graft_ts"),
      lit(0).as("__graft_side"),
      struct(payloadCols.map(col) :+
        epochMicros(right, rightTs).as("__graft_ots"): _*).as("__graft_r"))
      .withColumn("__graft_b", expr(s"__graft_ts div ${bucketWidth}L"))
    val l = left
      .withColumn("__graft_k", col(key))
      .withColumn("__graft_ts", epochMicros(left, leftTs))
      .withColumn("__graft_side", lit(1))
      .withColumn("__graft_b", expr(s"__graft_ts div ${bucketWidth}L"))
    // bounded summary: the last (ts, payload) per occupied right bucket
    val summary = r.groupBy("__graft_k", "__graft_b")
      .agg(max(struct(col("__graft_ts"), col("__graft_r"))).as("__graft_last"))
    // bucket universe from BOTH sides, so buckets with left rows but no
    // right rows still receive a carry from earlier buckets
    val universe = l.select(col("__graft_k"), col("__graft_b")).distinct()
      .unionByName(summary.select(col("__graft_k"), col("__graft_b"))).distinct()
    val wCarry = Window.partitionBy("__graft_k").orderBy("__graft_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = universe.join(summary, Seq("__graft_k", "__graft_b"), "left")
      .withColumn("__graft_carry", max(col("__graft_last")).over(wCarry))
      .where(col("__graft_carry").isNotNull)
      .select(col("__graft_k"),
        (col("__graft_b") * bucketWidth).as("__graft_ts"),
        lit(-1).as("__graft_side"),
        col("__graft_carry.__graft_r").as("__graft_r"),
        col("__graft_b"))
    val u = l.unionByName(r.unionByName(carry), allowMissingColumns = true)
    val w = Window.partitionBy("__graft_k", "__graft_b")
      .orderBy(col("__graft_ts"), col("__graft_side"), col("__graft_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("__graft_r"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case Some(tol) =>
        when(matchedRaw.isNotNull &&
          col("__graft_ts") - matchedRaw("__graft_ots") <= tol, matchedRaw)
      case None => matchedRaw
    }
    u.withColumn("__graft_m", matched)
      .where(col("__graft_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(c => col("__graft_m")(c).as(rightPrefix + c)): _*)
  }

  /**
   * Time-bucket downsample (pandas `resample` / OHLC bars): one row per
   * (key, bucket of `bucketWidth` ticks) with open/high/low/close of
   * `valueCol`, the row count and the sum.
   *
   * ONE shuffle with map-side partial aggregation — open/close are
   * `min`/`max` over `struct(ts, value)`, which combine associatively,
   * so a 100 TB scan reduces to |keys|×|buckets| rows before the
   * exchange. Ties at equal ts resolve to the smallest (open) /
   * greatest (close) value — a total order, so engines agree;
   * pre-aggregate to unique (key, ts) for other tie-breaks.
   *
   * `tsCol` may be TIMESTAMP/TIMESTAMP_NTZ (then `bucketWidth` is in
   * MICROS) or a numeric epoch in its own units, via [[epochMicros]].
   * `bucket_start` is returned in the normalized domain.
   */
  def resample(df: DataFrame, key: String, tsCol: String, valueCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    df.select(col(key), epochMicros(df, tsCol).as("__graft_t"),
        col(valueCol).as("__graft_v"))
      .groupBy(col(key), expr(s"__graft_t div ${bucketWidth}L").as("__graft_b"))
      .agg(
        min(struct(col("__graft_t"), col("__graft_v"))).as("__graft_o"),
        max(struct(col("__graft_t"), col("__graft_v"))).as("__graft_c"),
        min("__graft_v").as("low"), max("__graft_v").as("high"),
        count(lit(1)).as("n"), sum("__graft_v").as("total"))
      .select(col(key), (col("__graft_b") * bucketWidth).as("bucket_start"),
        col("__graft_o.__graft_v").as("open"), col("high"), col("low"),
        col("__graft_c.__graft_v").as("close"), col("n"), col("total"))
  }

  /**
   * Trailing rolling-window aggregates: for every input row, the
   * count/sum/min/max (and mean) of `valueCol` over the same key's rows
   * with `ts` in the inclusive range `[ts - window, ts]` — the
   * time-based `df.rolling(...)` of pandas, `RANGE BETWEEN n PRECEDING
   * AND CURRENT ROW` of SQL.
   *
   * One shuffle; the range frame streams through the window operator
   * with a sliding buffer bounded by the densest `window`-span of one
   * key. SKEW BOUND: like [[asofJoin]], the bare-key partitioning
   * serializes a single hot key through one task — use
   * [[rollingBucketed]] (identical results) when one key's row count
   * is itself cluster-scale.
   *
   * Sum/mean over doubles are floating-point: for hash-exact
   * cross-engine comparison feed an integral or decimal `valueCol`.
   */
  def rolling(df: DataFrame, key: String, tsCol: String, valueCol: String,
      window: Long, prefix: String = "roll_"): DataFrame = {
    require(window >= 0, s"window must be non-negative, got $window")
    val t = epochMicros(df, tsCol)
    val w = Window.partitionBy(col(key)).orderBy(col("__graft_t"))
      .rangeBetween(-window, 0)
    df.withColumn("__graft_t", t)
      .withColumn(prefix + "n", count(col(valueCol)).over(w))
      .withColumn(prefix + "sum", sum(col(valueCol)).over(w))
      .withColumn(prefix + "min", min(col(valueCol)).over(w))
      .withColumn(prefix + "max", max(col(valueCol)).over(w))
      .drop("__graft_t")
  }

  /**
   * Hot-key-safe twin of [[rolling]]: identical output for ANY
   * `bucketWidth >= window` (asserted by TemporalSpec), with the
   * per-key range window split across `(key, ts div bucketWidth)`
   * partitions so one hot key parallelizes over its time range.
   *
   * Each row computes its frame inside its own bucket; rows within
   * `window` of a bucket's END are additionally replicated as "ghost"
   * rows into the NEXT bucket (they can fall inside early frames
   * there), then dropped from the output. Because `bucketWidth >=
   * window`, a frame never reaches more than one bucket back, so one
   * ghost generation suffices and every frame sees exactly the rows of
   * the plain variant. Shuffle volume ≤ 2×|rows|; the densest
   * `window`-span bound on window-operator state is unchanged.
   */
  def rollingBucketed(df: DataFrame, key: String, tsCol: String,
      valueCol: String, window: Long, bucketWidth: Long,
      prefix: String = "roll_"): DataFrame = {
    require(window >= 0, s"window must be non-negative, got $window")
    require(bucketWidth >= window && bucketWidth > 0,
      s"bucketWidth ($bucketWidth) must be >= window ($window) and positive")
    val base = df.withColumn("__graft_t", epochMicros(df, tsCol))
      .withColumn("__graft_b", expr(s"__graft_t div ${bucketWidth}L"))
      .withColumn("__graft_ghost", lit(false))
    val ghosts = base
      .where(col("__graft_t") >= (col("__graft_b") + 1) * bucketWidth - window)
      .withColumn("__graft_b", col("__graft_b") + 1)
      .withColumn("__graft_ghost", lit(true))
    val w = Window.partitionBy(col(key), col("__graft_b"))
      .orderBy(col("__graft_t")).rangeBetween(-window, 0)
    base.unionByName(ghosts)
      .withColumn(prefix + "n", count(col(valueCol)).over(w))
      .withColumn(prefix + "sum", sum(col(valueCol)).over(w))
      .withColumn(prefix + "min", min(col(valueCol)).over(w))
      .withColumn(prefix + "max", max(col(valueCol)).over(w))
      .where(!col("__graft_ghost"))
      .drop("__graft_t", "__graft_b", "__graft_ghost")
  }

  /**
   * Funnel analysis: one row per key with the time each step of the
   * ordered `steps` sequence was first reached. Step 1's time is the
   * key's earliest `stepCol == steps(0)` event; step i's time is the
   * earliest `steps(i-1)` event at-or-after step i−1's time (and, with
   * `within`, no later than `within` ticks after step 1 — the
   * conversion-window convention). Equal timestamps DO progress the
   * funnel (non-strict, the SQL-friendly convention:
   * `t2 = min(ts | step = s2 AND ts >= t1)`).
   *
   * ONE shuffle: the per-step "first reach so far" times are running
   * prefix minima over a single `(key)` window ordered by
   * `(ts, step rank)` — the rank tie-break makes equal-ts progression
   * deterministic — followed by a plain aggregation. A key's rows
   * stream through the window operator with O(steps) state; no
   * self-joins, no per-step shuffles.
   *
   * Output: key, `t_1 .. t_k` (epoch micros, null where the funnel
   * stalled), `steps_completed`. Keys with no step-1 event keep a row
   * with zero completion IF they appear in `df` at all.
   */
  def funnel(df: DataFrame, key: String, tsCol: String, stepCol: String,
      steps: Seq[String], within: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    // rank: position in the funnel (unlisted events sort last — they
    // never produce candidates, so their order is irrelevant)
    val rank = steps.zipWithIndex.foldLeft(lit(steps.size)) {
      case (acc, (s, i)) => when(col("__graft_s") === s, lit(i)).otherwise(acc)
    }
    val w = Window.partitionBy("__graft_k")
      .orderBy(col("__graft_t"), col("__graft_rk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var cur = df.select(col(key).as("__graft_k"),
        epochMicros(df, tsCol).as("__graft_t"), col(stepCol).as("__graft_s"))
      .withColumn("__graft_rk", rank)
    steps.zipWithIndex.foreach { case (s, i) =>
      val inWindow = within match {
        case Some(win) if i > 0 =>
          col("__graft_t") <= col("__graft_r0") + win
        case _ => lit(true)
      }
      val cond =
        if (i == 0) col("__graft_s") === s
        else col("__graft_s") === s && col("__graft_t") >= col(s"__graft_r${i - 1}") &&
          inWindow
      cur = cur.withColumn(s"__graft_c$i", when(cond, col("__graft_t")))
      // the last step's candidates never feed another condition — its
      // prefix minimum would equal the plain min, so skip the pass
      if (i < steps.size - 1)
        cur = cur.withColumn(s"__graft_r$i", min(col(s"__graft_c$i")).over(w))
    }
    val stepCols = steps.indices.map(i => min(col(s"__graft_c$i")).as(s"t_${i + 1}"))
    val out = cur.groupBy(col("__graft_k").as(key))
      .agg(stepCols.head, stepCols.tail: _*)
    val completed = steps.indices.foldLeft(lit(0)) {
      case (acc, i) => acc + when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0)
    }
    out.withColumn("steps_completed", completed)
  }

  /**
   * Interval join: every (point, span) pair of the same key with
   * `startCol <= tsCol < endCol` (half-open, the event-log convention).
   *
   * Output = all point columns, plus each span column prefixed with
   * `spanPrefix`. Inner semantics — aggregate and re-join to the span
   * table for left-outer counts (see q_interval_join).
   *
   * Timestamps may be TIMESTAMP/TIMESTAMP_NTZ (normalized to epoch
   * micros via [[epochMicros]] — `bucketWidth` is then in MICROS) or
   * numeric epochs: bucketing is integer floor-division, and the exact
   * containment refine also runs in the normalized domain, so the
   * point and span sides may even mix typed and numeric timestamps.
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
      .withColumn("__graft_t", epochMicros(points, tsCol))
      .withColumn("__graft_b", expr(s"__graft_t div ${bucketWidth}L"))
    // one row per bucket the half-open span overlaps; empty spans vanish
    val sp = spans
      .withColumn("__graft_lo", epochMicros(spans, startCol))
      .withColumn("__graft_hi", epochMicros(spans, endCol))
      .where(col("__graft_hi") > col("__graft_lo"))
      .select(col(key).as("__graft_k"),
        col("__graft_lo"), col("__graft_hi"),
        explode(sequence(
          expr(s"__graft_lo div ${bucketWidth}L"),
          expr(s"(__graft_hi - 1) div ${bucketWidth}L"))).as("__graft_b"),
        struct(spanCols.map(col): _*).as("__graft_s"))
    p.join(sp, Seq("__graft_k", "__graft_b"))
      .where(col("__graft_t") >= col("__graft_lo") &&
        col("__graft_t") < col("__graft_hi"))
      .select(points.columns.toIndexedSeq.map(col) ++
        spanCols.map(c => col("__graft_s")(c).as(spanPrefix + c)): _*)
  }

  /**
   * Cohort retention: assign every key to the cohort of its FIRST
   * active day, then count distinct keys per (cohort day, day offset)
   * — the product-analytics triangle every events warehouse publishes.
   *
   * Two aggregations and one equi-join, all on the key: (1) per-key
   * first day (map-side-combining `min`), (2) distinct (key, day)
   * activity, (3) join on the key — the first-day table is one row per
   * key, so AQE broadcasts it at moderate cardinalities and a plain
   * shuffle join handles billions of keys — then the final
   * (cohort, offset) count. Exact integer counts; no windows, no
   * self-join over time.
   *
   * `tsCol` is schema-adaptive via [[epochMicros]]; days are UTC
   * calendar dates of the micros instant.
   */
  def cohortRetention(df: DataFrame, key: String, tsCol: String): DataFrame = {
    val day = to_date(timestamp_micros(epochMicros(df, tsCol)))
    val act = df.select(col(key).as("__graft_k"), day.as("__graft_day")).distinct()
    val first = act.groupBy("__graft_k")
      .agg(min(col("__graft_day")).as("cohort_day"))
    act.join(first, Seq("__graft_k"))
      .groupBy(col("cohort_day"),
        datediff(col("__graft_day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("__graft_k")).as("n_active"))
  }

  /**
   * SCD Type-2 history build: turns a changelog (one row per change
   * event) into validity intervals — each row gains `valid_from_us`
   * (its own change instant, epoch micros) and `valid_to_us` (the NEXT
   * change's instant for the same `keys`, null while current). The
   * inverse of [[Joins.compactLatest]] (which keeps only the last
   * version): SCD2 keeps every version and makes point-in-time lookup
   * an [[intervalJoin]] — the dimension-history recipe behind
   * "as of when the order shipped, what was the customer's tier".
   *
   * ONE shuffle: a `lead` window over `(keys | tsCol, tieCols...)`.
   * Partition state per key is its version count — bounded by update
   * rate, not corpus size; a key with pathological churn is a groupBy
   * hot key, never a product. `tieCols` must make the sort total
   * within a key (include a unique id) — same determinism contract as
   * compactLatest.
   *
   * `tsCol` is schema-adaptive via [[epochMicros]]. Output: input
   * columns + `valid_from_us`, `valid_to_us` (the half-open
   * `[from, to)` convention composes with intervalJoin's closed spans
   * via `to - 1`).
   */
  def scd2(df: DataFrame, keys: Seq[String], tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "keys required")
    val from = epochMicros(df, tsCol)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((from +: tieCols.map(col)).map(_.asc): _*)
    df.withColumn("valid_from_us", from)
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(w))
  }

  /**
   * Forward-fill over a dense time spine: `df` holds SPARSE
   * (key, bucket, value) observations on an integral bucket axis
   * (days, hours — any integer grid); the result has one row per key
   * per bucket from the key's first to last observation, with
   * `<value>_filled` = the most recent observation at or before that
   * bucket. The time-series completion step before any
   * fixed-cadence model consumes event data.
   *
   * Shapes: one groupBy for per-key bounds, a generator exploding the
   * spine (rows = Σ per-key ranges — the caller bounds the grid
   * granularity, and a key's spine is its own observed range, never
   * the corpus's), one left equi-join back, and one per-key window
   * (`last(value) ignoreNulls` over the bucket order). No self-joins
   * over time, no per-gap probes; a hot key is a groupBy/window hot
   * key, splittable by coarser buckets upstream.
   *
   * Output: `key`, `bucketCol`, the original sparse `valueCol`
   * (null on filled rows), and `<valueCol>_filled`.
   */
  /**
   * Merged-interval coverage per key: the total length of the UNION of
   * half-open `[start, end)` spans — uptime/SLA coverage, user active
   * time, sensor duty cycle — without materializing merged intervals.
   *
   * ONE window pass: rows sort by `(start, end)` per key, each row
   * contributes `max(0, end − max(start, prevMax))` where `prevMax` is
   * the running max of earlier ends — overlapped stretches contribute
   * zero, partial overlaps exactly their uncovered tail. A plain
   * aggregation folds contributions; integer micros keep it exact.
   * Per-key window state is one running max — no interval list, no
   * self-join, no merge materialization.
   *
   * Returns one row per key: `n_spans`, `span_sum` (Σ raw lengths),
   * `covered` (union length; `span_sum − covered` = overlap mass).
   */
  def intervalUnionLength(df: DataFrame, key: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(startCol, endCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__graft_pm", max(col(endCol)).over(w))
      .withColumn("__graft_c",
        greatest(lit(0L), col(endCol) -
          greatest(col(startCol), coalesce(col("__graft_pm"), col(startCol)))))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_spans"),
        sum(col(endCol) - col(startCol)).as("span_sum"),
        sum("__graft_c").as("covered"))
  }

  /**
   * Multi-touch attribution: for every `conversionType` event, the
   * first- and last-touch `touchTypes` event of the same `key` inside
   * a trailing lookback window of `lookbackMicros`. Returns one row
   * per conversion: (conversion id/key/ts, first_touch_{id,type,ts},
   * last_touch_{id,type,ts}) — touch fields null when no touch exists
   * in the window.
   *
   * Scale shape: ONE shuffle (hash by `key`), then two range-frame
   * window aggregates (`min`/`max` of a (ts, id, type) struct —
   * lexicographic, so ties at equal ts break by id deterministically).
   * The naive conversions×touches self-join this replaces explodes on
   * hot keys at 100 TB; a range frame is per-partition streaming state.
   * `tsCol` may be TIMESTAMP or numeric epoch ([[epochMicros]]).
   */
  def attribution(df: DataFrame, key: String, idCol: String, tsCol: String,
      typeCol: String, conversionType: String, touchTypes: Seq[String],
      lookbackMicros: Long): DataFrame = {
    require(lookbackMicros > 0, "lookbackMicros must be positive")
    require(!touchTypes.contains(conversionType),
      "conversionType cannot also be a touch type")
    val base = df.withColumn("__graft_t", epochMicros(df, tsCol))
    val w = Window.partitionBy(col(key)).orderBy(col("__graft_t"))
      .rangeBetween(-lookbackMicros, -1L)
    val touch = when(col(typeCol).isin(touchTypes: _*),
      struct(col("__graft_t").as("t"), col(idCol).as("id"), col(typeCol).as("tp")))
    base
      .withColumn("__graft_first", min(touch).over(w))
      .withColumn("__graft_last", max(touch).over(w))
      .where(col(typeCol) === conversionType)
      .select(col(idCol).as("conversion_id"), col(key),
        col("__graft_t").as("conv_ts"),
        col("__graft_first.id").as("first_touch_id"),
        col("__graft_first.tp").as("first_touch_type"),
        col("__graft_first.t").as("first_touch_ts"),
        col("__graft_last.id").as("last_touch_id"),
        col("__graft_last.tp").as("last_touch_type"),
        col("__graft_last.t").as("last_touch_ts"))
  }

  /**
   * Floor-clamped running balance: `bal_t = max(floor, bal_{t−1} +
   * delta_t)` — stock levels that cannot go negative, token-bucket
   * rate limiters, credit balances with a floor. Like
   * [[Stats.cusum]], the recurrence is NOT a loop: with `P` the plain
   * prefix sum, `bal_t = floor + (P_t − min(floor0, min_{j≤t} P_j))`
   * where `floor0 = 0` shifts the identity to a zero start — i.e. one
   * cumulative sum plus one running min over the SAME single shuffle
   * by `keys`. All integer; `(keys, orderCols)` must totally order
   * rows within a key (add a unique id as the tiebreaker).
   */
  def clampedCumSum(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
      deltaCol: String, floor: Long = 0L): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols required")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__graft_p", sum(col(deltaCol).cast("long")).over(w))
      .withColumn("balance",
        lit(floor) + col("__graft_p") -
          least(lit(0L), min(col("__graft_p")).over(w)))
      .drop("__graft_p")
  }

  def gapFill(df: DataFrame, key: String, bucketCol: String,
      valueCol: String): DataFrame = {
    val spine = df.groupBy(col(key))
      .agg(min(col(bucketCol)).as("__graft_lo"), max(col(bucketCol)).as("__graft_hi"))
      .select(col(key),
        explode(sequence(col("__graft_lo"), col("__graft_hi"))).as(bucketCol))
    val w = Window.partitionBy(key).orderBy(bucketCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(df.select(col(key), col(bucketCol), col(valueCol)),
        Seq(key, bucketCol), "left")
      .withColumn(s"${valueCol}_filled",
        last(col(valueCol), ignoreNulls = true).over(w))
  }

  /**
   * M4 time-series downsampling (Jugel et al., VLDB 2014): per
   * (keys, bucket) keep exactly the four points a pixel column of a
   * line chart can show — first, last, min, max — so a billion-point
   * series reduces to 4·buckets rows with a VISUALLY LOSSLESS
   * rendering guarantee, unlike stride sampling which erases spikes.
   *
   * ONE map-side-combinable groupBy: first/last ride min/max over
   * `struct(ts, v)` (lexicographic struct order — ties on ts resolve
   * by value, a total order any engine agrees on), min/max over the
   * value. No window, no sort, no second pass. `tsCol`/`valueCol`
   * must be integral (epoch micros + pre-scaled metric).
   *
   * PRECONDITION: `tsCol` ≥ 0 (epoch-anchored series). The bucket is
   * Spark's integral `div`, which truncates toward zero, while the
   * DuckDB oracle's `//` floors — the two agree exactly on
   * nonnegative timestamps and differ by one bucket on negative ones,
   * so pre-epoch data would need an explicit floor-div bucket.
   */
  def m4Downsample(df: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val ts = col(tsCol).cast("long")
    val v = col(valueCol).cast("long")
    val bucket = expr(s"cast(`$tsCol` as long) div ${bucketWidth}L")
    df.groupBy(keys.map(col) :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n"),
        min(v).as("v_min"), max(v).as("v_max"),
        min(struct(ts.as("t"), v.as("v"))).as("__f"),
        max(struct(ts.as("t"), v.as("v"))).as("__l"))
      .select(keys.map(col) ++ Seq(col("bucket"), col("n"),
        col("v_min"), col("v_max"),
        col("__f.t").as("ts_first"), col("__f.v").as("v_first"),
        col("__l.t").as("ts_last"), col("__l.v").as("v_last")): _*)
  }

  /**
   * First-seen growth curve: per (keys, bucket), how many ids appeared
   * for the FIRST time in that bucket, and the running cumulative —
   * the audience/corpus growth report ("distinct users to date" daily)
   * computed without ever re-scanning history: `min(bucket)` per id is
   * one map-side-combinable groupBy of the fact table, the curve is an
   * aggregate over THAT id-bounded table, and the cume window runs
   * over bucket rows (days, not events). Exact — no sketch error — at
   * one fact shuffle, because "cumulative distinct" over first-seen
   * buckets is exactly distinct-to-date.
   *
   * `keys` may be empty (one global curve); with keys the id's first
   * appearance counts per key group (a user first-seen in "click" and
   * later in "view" is new to each). Callers that derive `bucketCol`
   * with an integral `div` (e.g. the q_growth_curve day math) inherit
   * the same nonnegative-timestamp precondition as [[m4Downsample]]:
   * truncate-vs-floor only agree at ts ≥ 0.
   */
  def growthCurve(df: DataFrame, keys: Seq[String], idCol: String,
      bucketCol: String): DataFrame = {
    val kcols = keys.map(col)
    val first = df.groupBy(kcols :+ col(idCol): _*)
      .agg(min(col(bucketCol)).as("__graft_fb"))
    val curve = first.groupBy(kcols :+ col("__graft_fb").as(bucketCol): _*)
      .agg(count(lit(1)).as("new_ids"))
    val w = (if (keys.isEmpty) Window.partitionBy()
             else Window.partitionBy(kcols: _*))
      .orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    curve.withColumn("cum_ids", sum("new_ids").over(w))
  }

  /**
   * Debounce / tolerance dedup: flag events that repeat within
   * `minGap` of the PREVIOUS event on the same key — double-clicks,
   * retry storms, at-least-once delivery echoes — the ingest-cleanup
   * pass that runs before sessionization. LAG-based semantics (the
   * standard "suppress if the immediately preceding event is closer
   * than the gap", independent of whether that predecessor itself
   * survives — document this: it is NOT the chained rate-limiter,
   * whose keep-set depends recursively on prior keeps), with
   * `(tsCol, idCol)` as the total order so ties break
   * deterministically: an exact-duplicate timestamp always keeps the
   * smallest id and drops the rest (gap 0 < minGap).
   *
   * Scale shape: one window partitioned by `keys` ordered by
   * `(ts, id)` — a single shuffle on the key, per-key sort, no join;
   * the same shape (and the same skew profile) as sessionization.
   * Output: input rows + `prev_gap` (long, NULL on each key's first
   * event) + `is_kept` (first event of a key is always kept).
   */
  def debounce(df: DataFrame, keys: Seq[String], tsCol: String,
      idCol: String, minGap: Long): DataFrame = {
    require(keys.nonEmpty, "keys required")
    require(minGap > 0, s"minGap must be positive, got $minGap")
    // prev_gap / is_kept are reserved output names — overwriting an
    // existing column of the same name would silently destroy caller
    // data, so fail fast (consistent with the other Temporal helpers).
    Seq("prev_gap", "is_kept").foreach { r =>
      require(!df.columns.contains(r),
        s"debounce writes a '$r' column; input already has one — rename it first")
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(idCol))
    df.withColumn("prev_gap",
        col(tsCol).cast("long") - lag(col(tsCol).cast("long"), 1).over(w))
      .withColumn("is_kept",
        col("prev_gap").isNull || col("prev_gap") >= minGap)
  }

  /**
   * Session journey mining — the "common user paths" statistic of
   * clickstream analysis: events sessionize on an inactivity gap
   * (same closed-at-gap rule as the sessionization oracle: a new
   * session starts only when the gap EXCEEDS `gapMicros`), each
   * session becomes its ordered event-type path, and every length-`n`
   * window of every path counts toward the corpus journey table,
   * pruned at `minCount`. (The n=2 cut of this is the Markov
   * transition table; journeys keep the ORDER-n context transitions
   * lose.)
   *
   * Scale shape: ONE key-partitioned window pair (lag + running break
   * sum — sessionization's single shuffle), a (key, session) groupBy
   * whose in-group `sort_array` replays the (ts, id) total order
   * without a second window, strict [[graft.pipeline.NGrams]] path
   * windows, then one map-side-combinable journey count. Output:
   * `journey` (space-joined types), `cnt`.
   */
  def journeys(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, gapMicros: Long, n: Int = 3,
      minCount: Long = 2L): DataFrame = {
    require(gapMicros > 0, s"gapMicros must be positive, got $gapMicros")
    require(n >= 1, s"n must be >= 1, got $n")
    import graft.expressions.{asColumn, asExpr}
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = df
      .withColumn("__prev", lag(col(tsCol).cast("long"), 1).over(w))
      .withColumn("__brk",
        when(col("__prev").isNull ||
          col(tsCol).cast("long") - col("__prev") > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum("__brk").over(run))
    val paths = sess.groupBy(col(keyCol), col("__sid"))
      .agg(expr(s"transform(sort_array(collect_list(" +
        s"struct($tsCol, $idCol, $typeCol))), s -> s.$typeCol)").as("__path"))
    paths
      .select(explode(asColumn(graft.pipeline.NGrams(
        asExpr(col("__path")), n))).as("journey"))
      .groupBy("journey").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /**
   * EXACT lag-`k` autocorrelation per key over a pre-scaled integer
   * series — the seasonality/self-similarity probe (does yesterday
   * predict today? is the metric k-periodic?) that runs before
   * committing to a seasonal model. For the whole correlogram
   * (lags 1..L in one pass) use [[graft.pipeline.Stats.acf]] — the
   * multi-lag generalization of this identity. The textbook ACF
   * `r_k = Σ_{i≤n−k}(x_i−x̄)(x_{i+k}−x̄) / Σ_i(x_i−x̄)²` with the
   * FULL-series mean clears (×n²) to all-integer moments:
   *
   *   num·n² = n²·Σ x_i·x_{i+k} − n·S·(head_sum + tail_sum) + (n−k)·S²
   *   den·n² = n²·Σ x_i²       − n·S²
   *
   * (head = first n−k terms, tail = last n−k terms, S = Σ x_i) —
   * computed in DECIMAL(38,0), reported as sign-handled truncating
   * permille; NULL when the series is constant (den = 0) or shorter
   * than k+1. `valueCol` must be integral (scale cents/micros before
   * calling — the same pre-scaled-long contract as [[Stats]] gates).
   *
   * Scale shape: ONE window per key ordered by (`orderCol`, `idCol`)
   * computing lead(k), then one map-side-combinable groupBy(key) of
   * six integer moments — a single keyed shuffle + aggregate, the
   * gapRegularity profile. Output: key, n, acf_num, acf_den (longs,
   * null on overflow of the cast-down; the permille itself is exact),
   * acf_permille.
   */
  def autocorr(df: DataFrame, keyCol: String, orderCol: String,
      idCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(keyCol).orderBy(col(orderCol), col(idCol))
    val x = col(valueCol).cast("decimal(38,0)")
    val lagged = df
      .select(col(keyCol).as("key"), x.as("__x"),
        lead(x, k).over(w).as("__y"))
    lagged.groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__s"),
        sum(col("__x") * col("__x")).as("__ssq"),
        sum(when(col("__y").isNotNull, col("__x") * col("__y"))).as("__sxy"),
        sum(when(col("__y").isNotNull, col("__x"))).as("__head"),
        sum(when(col("__y").isNotNull, col("__y"))).as("__tail"))
      .withColumn("__n", col("n").cast("decimal(38,0)"))
      .withColumn("__num",
        col("__n") * col("__n") * col("__sxy") -
          col("__n") * col("__s") * (col("__head") + col("__tail")) +
          (col("__n") - lit(k)) * col("__s") * col("__s"))
      .withColumn("__den",
        col("__n") * col("__n") * col("__ssq") -
          col("__n") * col("__s") * col("__s"))
      .select(col("key"), col("n"),
        col("__num").cast("long").as("acf_num"),
        col("__den").cast("long").as("acf_den"),
        expr(s"""cast(case when __den is null or __den = 0 or __num is null
          |       then null
          |     when __num >= 0 then __num * 1000 div __den
          |     else -((-__num) * 1000 div __den) end as long)""".stripMargin)
          .as("acf_permille"))
  }

  /**
   * Burst segment detection over a per-key bucketed count series — the
   * "when did this term/domain/user spike, and for how long" statistic
   * (the run-length core of Kleinberg burst detection with a fixed
   * threshold in place of the HMM): a burst is a MAXIMAL run of
   * CONSECUTIVE buckets whose count is ≥ `threshold`, reported once per
   * run with its start bucket, length and total mass, pruned at
   * `minLen`. Islands form with the classic gaps-and-islands key
   * `bucket − row_number()` (consecutive hot buckets share it), so the
   * whole operator is two windows + one groupBy over the ALREADY
   * AGGREGATED (key, bucket) table — never the raw events.
   *
   * Scale shape: input is the bucketed count table (bounded by
   * keys × buckets, the termCountsWindowed output shape); both windows
   * and the groupBy partition BY KEY — one keyed shuffle, no global
   * sort. Output: key, seg_start, n_buckets, total_cnt.
   */
  def burstSegments(df: DataFrame, keyCol: String, bucketCol: String,
      cntCol: String, threshold: Long, minLen: Int = 2): DataFrame = {
    require(minLen >= 1, s"minLen must be >= 1, got $minLen")
    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
    df.where(col(cntCol) >= threshold)
      .withColumn("__grp",
        col(bucketCol).cast("long") - row_number().over(w))
      .groupBy(col(keyCol), col("__grp"))
      .agg(min(col(bucketCol).cast("long")).as("seg_start"),
        count(lit(1)).as("n_buckets"),
        sum(col(cntCol).cast("long")).as("total_cnt"))
      .where(col("n_buckets") >= minLen)
      .drop("__grp")
  }

  /**
   * Truncated exponentially-weighted moving average (decay ½ per step)
   * over a pre-scaled integral metric — the smoothing a control chart
   * or live health monitor puts in front of a gate, in EXACT integer
   * arithmetic: weight 2^(L−1−k) on lag k over the last `lags` rows,
   *
   *   ewma_milli = 1000 · Σₖ v_{t−k}·2^(L−1−k)  div  Σₖ 2^(L−1−k)
   *
   * with absent lags (series head) excluded from BOTH sums, so early
   * rows average over what exists. Halving weights put >99.9% of the
   * mass inside 10 lags — the truncation at `lags ≤ 16` changes
   * nothing observable and is what makes the recursion windowable (the
   * infinite-memory recurrence is inherently sequential; the truncated
   * form is L lag() reads over ONE per-key window sort, exactly
   * replayable by any engine with LAG).
   *
   * Scale shape: one per-key window (partitioned — never a global
   * sort), L lag expressions sharing its single sort; no joins, no
   * second shuffle. `orderCol` must be unique per key (the
   * deterministic-window contract).
   *
   * Returns the input plus `ewma_milli`.
   */
  def ewmaSmooth(df: DataFrame, keyCol: String, orderCol: String,
      valueCol: String, lags: Int = 8): DataFrame = {
    require(lags >= 1 && lags <= 16, s"lags must be in [1,16], got $lags")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val v = col(valueCol).cast("long")
    val terms = (0 until lags).map { k =>
      val wt = 1L << (lags - 1 - k)
      val l = lag(v, k).over(w)
      (when(l.isNotNull, l * lit(wt)).otherwise(0L),
        when(l.isNotNull, lit(wt)).otherwise(0L))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.withColumn("__graft_num", num)
      .withColumn("__graft_den", den)
      .withColumn("ewma_milli",
        expr("(1000 * __graft_num) div __graft_den"))
      .drop("__graft_num", "__graft_den")
  }
}
