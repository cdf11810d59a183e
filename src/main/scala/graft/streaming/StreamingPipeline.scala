package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming faces of the training-data pipeline: exact dedup with
 * watermark-bounded state and custom running state via
 * mapGroupsWithState. Structured Streaming runs every stateless graft
 * expression unchanged (StreamingGeoJsonSpec); these helpers cover the
 * STATEFUL pieces a continuous ingestion pipeline needs.
 */
object StreamingPipeline {

  /**
   * Streaming exact deduplication: first occurrence of each content
   * hash within the watermark horizon passes, later copies drop.
   * `dropDuplicatesWithinWatermark` bounds the state store by the
   * watermark (old hashes age out) — at 100 TB/day the state is the
   * horizon's distinct-hash set, not history.
   */
  def dedupExact(df: DataFrame, textCol: String, eventTimeCol: String,
      watermark: String): DataFrame =
    df.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /**
   * Streaming incremental dedup against a STATIC reference corpus: rows
   * whose content fingerprint might be in the reference Bloom bitset
   * drop; the rest pass, optionally also deduped within the stream by
   * [[dedupExact]]'s watermark horizon. The bitset is a per-row scalar
   * probe of broadcast bits — no stream-static join, no extra state, so
   * the reference corpus costs m/8 bytes per executor regardless of its
   * row count. False positives (bounded, deterministic) drop novel docs;
   * false negatives never pass a true duplicate of the reference.
   */
  def dedupAgainstBloom(df: DataFrame, textCol: String, bits: Array[Long],
      k: Int): DataFrame = {
    import graft.expressions.{asColumn, asExpr}
    val fp = asColumn(graft.pipeline.Fingerprint64(asExpr(col(textCol))))
    df.where(!graft.pipeline.BloomDedup.bloomContains(
      org.apache.spark.sql.functions.lit(bits), fp, k))
  }

  /** One row of the chunk-blocked simhash stream (see dedupNearSimHash).
    * `ts` keeps the watermarked event-time column itself — replacing it
    * with a cast would strip the watermark the event-time timeout needs. */
  final case class ChunkRow(chunkIdx: Int, chunk: Long, docId: Long, sh: Long,
    ts: java.sql.Timestamp) {
    def tsMs: Long = ts.getTime
  }
  /** Per-(chunk_idx, chunk) state: (simhash, event-time ms, doc id) of the
    * keepers seen inside the watermark horizon. */
  final case class ChunkState(entries: List[(Long, Long, Long)])
  /** A drop decision: `doc_id` is a near-duplicate of earlier `dup_of`. */
  final case class NearDup(doc_id: Long, dup_of: Long, hamming: Int, chunk_idx: Int)

  /**
   * Streaming NEAR-duplicate detection: the batch SimHash blocking
   * ([[graft.pipeline.Dedup.simhashPairs]]) as a stateful stream. Each
   * document's 64-bit simhash is split into four 16-bit chunks; state
   * lives per (chunk_idx, chunk_value) bucket — the same pigeonhole
   * blocking as the batch path (hamming ≤ 3 guarantees a shared chunk),
   * so state per bucket is the horizon's keepers in that bucket, never
   * an all-pairs structure. Emits one [[NearDup]] row per detection
   * (a doc colliding in several chunks may emit several — `distinct`
   * downstream if exact-once drop decisions are needed).
   *
   * State is watermark-bounded twice over: entries older than the
   * horizon are pruned on every update, and idle buckets expire whole
   * via an event-time timeout one horizon past the watermark.
   */
  def dedupNearSimHash(df: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, watermark: String, maxHamming: Int = 3): Dataset[NearDup] = {
    import df.sparkSession.implicits._
    val horizonMs = {
      val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
      require(iv.months == 0, "watermark must be a day-time interval")
      iv.days * 86400000L + iv.microseconds / 1000L
    }
    val sh = graft.pipeline.TextFunctions.simhash(col(textCol))
    val chunkArr = array((0 until 4).map(i =>
      shiftrightunsigned(col("sh"), i * 16).bitwiseAND(lit(0xffffL))): _*)
    val rows = df.withColumn("sh", sh)
      .withWatermark(eventTimeCol, watermark)
      .select(col(eventTimeCol), col(idCol).cast("long").as("docId"), col("sh"),
        posexplode(chunkArr).as(Seq("chunkIdx", "chunk")))
      .select(col("chunkIdx").cast("int").as("chunkIdx"), col("chunk"),
        col("docId"), col("sh"), col(eventTimeCol).as("ts"))
      .as[ChunkRow]
    rows.groupByKey(r => (r.chunkIdx, r.chunk))
      .flatMapGroupsWithState[ChunkState, NearDup](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), it: Iterator[ChunkRow], state: GroupState[ChunkState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDup]
            var maxTs = 0L
            // deterministic within-batch order: by event time, then id
            for (r <- it.toSeq.sortBy(r => (r.tsMs, r.docId))) {
              maxTs = math.max(maxTs, r.tsMs)
              // prune BEFORE matching, relative to this row's event time —
              // a keeper older than the horizon must not suppress a doc
              // arriving a full horizon later (rows are ts-ascending, so
              // pruning is monotone across the batch)
              entries = entries.filter(_._2 >= r.tsMs - horizonMs)
              entries.find(e =>
                e._3 != r.docId &&
                  java.lang.Long.bitCount(e._1 ^ r.sh) <= maxHamming) match {
                case Some((esh, _, eid)) =>
                  out += NearDup(r.docId, eid, java.lang.Long.bitCount(esh ^ r.sh), r.chunkIdx)
                case None =>
                  entries = (r.sh, r.tsMs, r.docId) :: entries
              }
            }
            state.update(ChunkState(entries))
            state.setTimeoutTimestamp(
              math.max(state.getCurrentWatermarkMs(), maxTs) + horizonMs)
            out.iterator
          }
      }
  }

  /** One tagged row of the unioned as-of stream: side 0 = right
    * (reference update), side 1 = left (row to enrich); right rows sort
    * before left rows at equal ts so exact-ts matches are included,
    * like the batch [[graft.pipeline.Temporal.asofJoin]] window order. */
  final case class AsofRow(k: Long, t: Long, side: Int, id: Long, v: Double)
  /** Per-key state: the single latest reference (ts, value) — one small
    * struct per key, independent of stream length. */
  final case class AsofRef(t: Long, v: Double)
  /** One enriched left row — q_asof's exact output shape, so the batch
    * operator is the parity oracle. */
  final case class AsofMatch(event_id: Long, user_id: Long, tus: Long,
    view_tus: Option[Long], view_value: Option[Double])

  /**
   * Streaming as-of (point-in-time) enrichment — the streaming face of
   * [[graft.pipeline.Temporal.asofJoin]]: every left row is annotated
   * with the latest right (ts, value) of the same key at-or-before its
   * own ts. The classic feature-store / CDC-enrichment operator: the
   * right stream is a trickle of reference updates, the left stream the
   * firehose to enrich.
   *
   * Custom state via flatMapGroupsWithState because no built-in
   * stream-stream join expresses "latest at-or-before" with O(1) state:
   * the watermarked range join buffers a horizon of BOTH sides, where
   * the as-of contract needs exactly ONE struct per key (the newest
   * reference row), however old it is. Per batch, each key's rows are
   * processed in (ts, side, value) event-time order, so within a
   * micro-batch the result equals the batch operator row-for-row
   * (asserted by StreamingPipelineSpec); across batches the state
   * carries the latest reference through the checkpoint.
   *
   * Contract for out-of-order arrivals ACROSS batches: the state is the
   * single newest reference, so a right row arriving in a later batch
   * with an OLDER ts than the retained one cannot serve left rows —
   * enrich-with-latest-known, the feature-store semantics. Feed the
   * right stream roughly in order (or widen upstream watermarks) where
   * the exact backward match matters.
   *
   * Timestamps resolve schema-adaptively ([[graft.pipeline.Temporal
   * .epochMicros]]): TIMESTAMP/TIMESTAMP_NTZ or numeric epoch micros.
   * State never times out (one struct per live key — bounded by the key
   * cardinality, not the stream).
   */
  def asofJoinStream(left: DataFrame, right: DataFrame, key: String,
      idCol: String, leftTs: String, rightTs: String,
      valueCol: String): Dataset[AsofMatch] = {
    import left.sparkSession.implicits._
    val l = left.select(col(key).cast("long").as("k"),
      graft.pipeline.Temporal.epochMicros(left, leftTs).as("t"),
      lit(1).as("side"), col(idCol).cast("long").as("id"),
      lit(Double.NaN).as("v"))
    val r = right.select(col(key).cast("long").as("k"),
      graft.pipeline.Temporal.epochMicros(right, rightTs).as("t"),
      lit(0).as("side"), lit(-1L).as("id"),
      col(valueCol).cast("double").as("v"))
    l.unionByName(r).as[AsofRow]
      .groupByKey(_.k)
      .flatMapGroupsWithState[AsofRef, AsofMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[AsofRow], state: GroupState[AsofRef]) =>
          var ref = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
          // (t, side, v): right before left at equal ts; max value wins
          // a right-side ts tie — the batch window's payload tie-break
          for (row <- it.toSeq.sortBy(r => (r.t, r.side, r.v))) {
            if (row.side == 0) {
              if (ref == null || row.t > ref.t ||
                (row.t == ref.t && row.v > ref.v)) ref = AsofRef(row.t, row.v)
            } else if (ref != null && ref.t <= row.t) {
              out += AsofMatch(row.id, k, row.t, Some(ref.t), Some(ref.v))
            } else {
              out += AsofMatch(row.id, k, row.t, None, None)
            }
          }
          if (ref != null) state.update(ref)
          out.iterator
      }
  }

  /** One changelog version: key, epoch-micros change time, unique id
    * (the within-ts tie-break), payload value. */
  final case class Scd2Row(k: Long, t: Long, id: Long, v: Double)
  /** Per-key state: the currently-open version. */
  final case class Scd2Open(t: Long, id: Long, v: Double)
  /** A CLOSED version: superseded at `valid_to_us`. */
  final case class Scd2Closed(key: Long, id: Long, value: Double,
    valid_from_us: Long, valid_to_us: Long)

  /**
   * Streaming SCD Type-2 history — the streaming face of
   * [[graft.pipeline.Temporal.scd2]]: each arriving version CLOSES its
   * key's previously-open version (emitting it with
   * `valid_to_us` = the new version's instant) and becomes the open
   * one. Append-mode emission is exactly the closed rows — the open
   * version per key lives in the state store (ONE struct per live key,
   * like [[asofJoinStream]]) and is emitted only when superseded, so
   * downstream sinks receive every history row exactly once, already
   * immutable.
   *
   * Within a micro-batch, versions sort by `(t, id)` — a single batch
   * over a static frame equals the batch operator's closed rows
   * row-for-row (spec-pinned). Across batches the same
   * latest-known contract as asofJoinStream: a version arriving in a
   * later batch with an OLDER ts than its key's open version cannot
   * rewrite already-emitted history — it closes instantly (zero-length
   * validity ending at the open version's start), keeping emitted
   * intervals append-only, which is the property SCD2 sinks need.
   *
   * Timestamps resolve schema-adaptively
   * ([[graft.pipeline.Temporal.epochMicros]]). State never times out.
   */
  def scd2Stream(df: DataFrame, key: String, tsCol: String, idCol: String,
      valueCol: String): Dataset[Scd2Closed] = {
    import df.sparkSession.implicits._
    df.select(col(key).cast("long").as("k"),
        graft.pipeline.Temporal.epochMicros(df, tsCol).as("t"),
        col(idCol).cast("long").as("id"),
        col(valueCol).cast("double").as("v"))
      .as[Scd2Row]
      .groupByKey(_.k)
      .flatMapGroupsWithState[Scd2Open, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[Scd2Row], state: GroupState[Scd2Open]) =>
          var open = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
          for (row <- it.toSeq.sortBy(r => (r.t, r.id))) {
            if (open == null) {
              open = Scd2Open(row.t, row.id, row.v)
            } else if (row.t >= open.t) {
              out += Scd2Closed(k, open.id, open.v, open.t, row.t)
              open = Scd2Open(row.t, row.id, row.v)
            } else {
              // late straggler: close instantly at the open version's
              // start — emitted history stays append-only
              out += Scd2Closed(k, row.id, row.v, row.t, open.t)
            }
          }
          if (open != null) state.update(open)
          out.iterator
      }
  }

  /** One funnel event after rank projection: key, epoch-micros time,
    * step index in the funnel (unlisted events are filtered upstream). */
  final case class FunnelRow(k: Long, t: Long, rk: Int)
  /** Per-key state: first-reach time per step, -1 = unreached. */
  final case class FunnelSt(times: Seq[Long])
  /** Funnel progression emitted per key per micro-batch. */
  final case class FunnelOut(key: Long, stepTimes: Seq[Long], stepsCompleted: Int)

  /**
   * Streaming funnel — the stateful face of
   * [[graft.pipeline.Temporal.funnel]]: per-key step first-reach times
   * carried in the state store (one `steps.size`-long array per live
   * key), updated each micro-batch and emitted as a progression row for
   * every key the batch touched. A single micro-batch over a static
   * frame equals the batch operator row-for-row (events sort by
   * `(t, step rank)` inside the group, replaying the batch window's
   * equal-ts tie-break; StreamingPipelineSpec pins the parity).
   *
   * PROGRESSIVE semantics across batches: steps LATCH at first reach
   * against the state as of arrival — a late-arriving earlier step-1
   * event cannot retroactively re-time steps already latched (the
   * same enrich-with-known trade [[asofJoinStream]] documents). Feed
   * the stream roughly in order where exact cross-batch parity with
   * the batch operator matters.
   *
   * `within` bounds later steps relative to the latched step-1 time, in
   * the normalized micros domain. Unreached steps report -1 (a typed
   * Dataset keeps the state encoder lean; map to nulls at the edge if
   * SQL-style output is wanted).
   */
  def funnelStream(df: DataFrame, key: String, tsCol: String,
      stepCol: String, steps: Seq[String],
      within: Option[Long] = None): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "steps must be non-empty")
    import df.sparkSession.implicits._
    val rank = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col(stepCol) === s, lit(i)).otherwise(acc)
    }
    val rows = df.select(col(key).cast("long").as("k"),
        graft.pipeline.Temporal.epochMicros(df, tsCol).as("t"),
        rank.as("rk"))
      .where(col("rk") >= 0).as[FunnelRow]
    val n = steps.size
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[FunnelSt, FunnelOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[FunnelRow], state: GroupState[FunnelSt]) =>
          val times = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(n)(-1L))
          for (r <- it.toSeq.sortBy(x => (x.t, x.rk))) {
            val i = r.rk
            val prevOk = i == 0 || (times(i - 1) >= 0 && r.t >= times(i - 1))
            val withinOk = i == 0 ||
              within.forall(w => times(0) >= 0 && r.t <= times(0) + w)
            if (times(i) < 0 && prevOk && withinOk) times(i) = r.t
          }
          state.update(FunnelSt(times.toSeq))
          Iterator.single(FunnelOut(k, times.toSeq, times.count(_ >= 0)))
      }
  }

  /**
   * Streaming PSI drift monitor: per event-time window, the
   * population-stability index of a metric column against a STATIC
   * reference distribution (bounds + counts fit offline with
   * [[graft.pipeline.Stats.psiReport]]'s decile machinery). Append
   * mode needs ONE aggregation, so the per-bucket counts are
   * conditional sums inside a single windowed groupBy — never a
   * second aggregation over bucket rows — and the micro-nat PSI is a
   * plain expression over the B count columns. Alert when
   * `psi_unats` crosses the usual gates (0.1 ≙ 100 000, 0.25 ≙
   * 250 000). State is one row of B longs per open window.
   */
  def psiWindowed(df: DataFrame, eventTimeCol: String, valueCol: String,
      refBounds: Array[Long], refCounts: Array[Long],
      windowDuration: String, watermarkDelay: String = "0 seconds"): DataFrame = {
    val b = refCounts.length
    require(b >= 2, s"need >= 2 buckets, got $b")
    require(refBounds.length == b - 1,
      s"bounds must be counts-1 long, got ${refBounds.length} vs $b")
    val v = col(valueCol).cast("long")
    val bucket = refBounds.foldLeft(lit(0))((acc, x) =>
      acc + when(v >= lit(x), 1).otherwise(0))
    val counts = (0 until b).map(i =>
      sum(when(bucket === i, 1L).otherwise(0L)).as(s"__c$i"))
    val agg = df
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration))
      .agg(counts.head, counts.tail: _*)
    val cTot = (0 until b).map(i => col(s"__c$i")).reduce(_ + _)
    val rTot = refCounts.sum
    val psi = (0 until b).map { i =>
      val p = (lit(refCounts(i)) + lit(1.0)) / lit(rTot + b.toDouble)
      val q = (col(s"__c$i") + lit(1.0)) / (cTot + lit(b.toDouble))
      round(lit(1e6) * (p - q) * (log(p) - log(q))).cast("long")
    }.reduce(_ + _)
    agg.select(col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      cTot.as("n_events"), psi.as("psi_unats"))
  }

  /**
   * Streaming distinct-count monitor: per event-time window, the
   * integer-exact raw-HLL estimate of `idCol`'s cardinality — the
   * "unique users per hour" board that exact distinct cannot serve at
   * stream scale (its state would be the id set itself). State per
   * open window is the m-register sketch (m longs), merged by
   * elementwise max — commutative and idempotent, so late or replayed
   * rows never corrupt it. The estimate is
   * [[graft.pipeline.Hll.estimate]]'s division-exact integer form: a
   * single micro-batch over a static frame equals the batch
   * `Hll.sketch`/`estimate` aggregate row-for-row
   * (StreamingPipelineSpec pins the parity against the oracled q_hll
   * machinery).
   */
  def distinctWindowed(df: DataFrame, eventTimeCol: String, idCol: String,
      windowDuration: String, m: Int = 64,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val agg = df
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDuration))
      .agg(graft.pipeline.Hll.sketch(col(idCol), m).as("__sk"),
        count(lit(1)).as("n_events"))
    agg.select(col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      col("n_events"),
      graft.pipeline.Hll.estimate(col("__sk"), m).as("n_distinct_est"))
  }

  /**
   * Windowed term counts — the trending-terms monitor (what is the
   * feed talking about THIS hour?), one API for both faces: under a
   * batch frame it is a plain tumbling-window token count; under
   * `readStream` the same call is a watermarked streaming aggregation
   * whose count reducer is commutative — late rows within the
   * watermark fold in exactly. Top-k per window is deliberately the
   * CONSUMER's cut (a rank after a streaming agg would chain two
   * stateful aggregations, which append-mode streaming forbids — the
   * batch q_trending applies it; dashboards read the counts table).
   *
   * Scale shape: explode to (window, token) and ONE map-side-
   * combinable count — the shuffle carries distinct (window, token)
   * partials, never raw rows.
   *
   * Composing downstream of another stateful operator that already
   * watermarked `eventTimeCol` (e.g. [[dedupExact]] in a multi-stateful
   * append chain): pass `watermarkDelay = null` to INHERIT the upstream
   * watermark — Spark disallows redefining it mid-plan.
   */
  def termCountsWindowed(df: DataFrame, eventTimeCol: String,
      textCol: String, windowDuration: String,
      watermarkDelay: String = "0 seconds"): DataFrame =
    (if (watermarkDelay == null) df
     else df.withWatermark(eventTimeCol, watermarkDelay))
      .select(col(eventTimeCol), explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
      .groupBy(window(col(eventTimeCol), windowDuration), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("term"), col("cnt"))

  final case class TrendRow(w: Long, term: String, ts: java.sql.Timestamp)
  final case class TrendSt(terms: Map[String, Long])
  final case class TrendOut(window_start: Long, term: String, cnt: Long,
      rank: Int)

  /**
   * UPDATE-mode live trending top-k — the dashboard face of
   * [[termCountsWindowed]]: each micro-batch re-emits every touched
   * window's CURRENT top-`k` terms (cnt DESC, term ASC ties — the
   * batch q_trending cut), so a live sink always holds the freshest
   * ranking without chaining a rank over a streaming aggregation
   * (append mode forbids two stateful aggs; update mode + explicit
   * state sidesteps it).
   *
   * State per open window is a Misra–Gries summary of at most
   * `capacity` counters — the bounded-memory frequent-items sketch
   * (Misra & Gries '82; counts are undercounts by at most
   * n/capacity, and any term with true share > 1/capacity is
   * guaranteed present). With `capacity` ≥ the window's distinct-term
   * count the counters — and therefore the emitted top-k — are EXACT
   * and equal the batch cut row-for-row (StreamingPipelineSpec pins
   * this on the q_trending fixture). Choose capacity ≫ k (default
   * 1024 vs a dashboard's k ≈ 10) so heavy hitters never evict.
   *
   * Scale shape: one groupByKey shuffle on window start; state is
   * O(windows-IN-FLIGHT × capacity) regardless of corpus size — and
   * "in flight" is enforced, not aspirational: under streaming
   * execution each window's state carries an EVENT-TIME TIMEOUT at
   * `window_start + windowMicros + watermarkDelay`, so once the
   * watermark passes a window's close the state is dropped on the
   * next micro-batch (the eviction emits nothing — the window's last
   * Update-mode rows already hold its final ranking). Without it the
   * key space — window starts — grows with TIME by construction and
   * state would never shrink over the stream's lifetime. Late rows
   * beyond `watermarkDelay` are dropped by the same watermark. Under
   * a batch frame (parity harnesses) there is no watermark: timeouts
   * are inert and the call degrades to the plain one-pass sketch.
   *
   * BEHAVIOR CHANGE (r15): streaming callers now run WITH a watermark
   * (required by the state eviction above). The `"0 seconds"` default
   * matches the sibling functions' defaults but means any out-of-order
   * row — event time at or below the max seen — is DROPPED, where the
   * pre-r15 unwatermarked version counted it. Real-world streams with
   * mild disorder should pass an explicit `watermarkDelay` (one window
   * is a sound default: state stays O(2 windows × capacity)); batch
   * callers are unaffected.
   */
  def trendingTopKStream(df: DataFrame, eventTimeCol: String,
      textCol: String, windowMicros: Long, k: Int,
      capacity: Int = 1024, watermarkDelay: String = "0 seconds"): Dataset[TrendOut] = {
    require(windowMicros > 0, s"windowMicros must be positive, got $windowMicros")
    require(k >= 1, s"k must be >= 1, got $k")
    require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")
    import df.sparkSession.implicits._
    val streaming = df.isStreaming
    val tus = unix_micros(col(eventTimeCol))
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout // batch: no watermark to time against
    df.withWatermark(eventTimeCol, watermarkDelay)
      .select(
        // epoch-aligned floor (pmod handles pre-epoch timestamps the way
        // the built-in window() does)
        (tus - pmod(tus, lit(windowMicros))).as("w"),
        explode(split(col(textCol), " ")).as("term"),
        // the watermarked column rides along so late-row filtering can
        // bind to it (a bare alias keeps the attribute's watermark tag;
        // wrapping it in a cast would strip the metadata)
        col(eventTimeCol).as("ts"))
      .where(col("term") =!= "").as[TrendRow]
      .groupByKey(_.w)
      .flatMapGroupsWithState[TrendSt, TrendOut](
        OutputMode.Update, timeout) {
        (w: Long, it: Iterator[TrendRow], state: GroupState[TrendSt]) =>
          if (state.hasTimedOut) {
            // watermark passed this window's close: evict, emit nothing
            state.remove()
            Iterator.empty
          } else {
            val m = scala.collection.mutable.Map.empty[String, Long]
            state.getOption.foreach(s => m ++= s.terms)
            for (r <- it) {
              m.get(r.term) match {
                case Some(c) => m(r.term) = c + 1L
                case None if m.size < capacity => m(r.term) = 1L
                case None => // Misra–Gries decrement step: all counters -1
                  for ((t, c) <- m) if (c <= 1L) m.remove(t) else m(t) = c - 1L
              }
            }
            state.update(TrendSt(m.toMap))
            if (streaming) {
              // evict once the watermark clears the window close (+1 ms:
              // the timeout must sit strictly past the current watermark).
              // CEILING of the true close in ms (floorDiv handles
              // pre-epoch negatives): truncating each micros term
              // separately could land up to ~2 ms early, and a watermark
              // in that gap would evict state while rows with event time
              // in (watermark, close) are still accepted — a straggler
              // would then re-open the window and emit a wrong low-count
              // ranking for an already-finalized window.
              state.setTimeoutTimestamp(
                math.max(Math.floorDiv(w + windowMicros + 999L, 1000L),
                  state.getCurrentWatermarkMs() + 1L))
            }
            m.toSeq.sortBy { case (t, c) => (-c, t) }.take(k).iterator
              .zipWithIndex
              .map { case ((t, c), i) => TrendOut(w, t, c, i + 1) }
          }
      }
  }

  /**
   * Streaming M4 downsampling — the live-dashboard face of
   * [[graft.pipeline.Temporal.m4Downsample]]: per key and event-time
   * window, first/last/min/max of the metric via the same
   * lexicographic `struct(ts, v)` min/max, so the chart points are
   * EXACTLY the batch operator's rows (all four reducers are
   * commutative and idempotent — late or replayed rows never corrupt
   * them; a single micro-batch over a static frame is row-identical
   * to the batch operator, StreamingPipelineSpec pins it). State per
   * open (key, window) is six longs + two timestamps — O(1) however
   * many points stream through.
   */
  def m4Windowed(df: DataFrame, keys: Seq[String], eventTimeCol: String,
      valueCol: String, windowDuration: String,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    val ts = unix_micros(col(eventTimeCol))
    val v = col(valueCol).cast("long")
    val agg = df
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(keys.map(col) :+ window(col(eventTimeCol), windowDuration): _*)
      .agg(count(lit(1)).as("n"),
        min(v).as("v_min"), max(v).as("v_max"),
        min(struct(ts.as("t"), v.as("v"))).as("__f"),
        max(struct(ts.as("t"), v.as("v"))).as("__l"))
    agg.select(keys.map(col) ++ Seq(
      col("window.start").as("window_start"),
      col("window.end").as("window_end"),
      col("n"), col("v_min"), col("v_max"),
      col("__f.t").as("ts_first"), col("__f.v").as("v_first"),
      col("__l.t").as("ts_last"), col("__l.v").as("v_last")): _*)
  }

  /** One (id, bucket) observation of the first-seen stream. */
  final case class FirstSeenRow(id: Long, bucket: Long)
  /** An id's one-and-only emission: the bucket it was first observed in. */
  final case class FirstSeenOut(id: Long, first_bucket: Long)

  /**
   * Streaming first-seen monitor — the live face of
   * [[graft.pipeline.Temporal.growthCurve]]: emits each id EXACTLY
   * ONCE, tagged with the bucket it was first observed in, so a
   * downstream per-bucket count of the emitted rows IS the growth
   * curve's `new_ids` column (and its running sum the `cum_ids`
   * curve). Within a micro-batch the id's MINIMUM bucket wins —
   * matching the batch operator's `min(bucket)`, so a single batch
   * over a static frame reproduces the batch first-seen table
   * row-for-row (StreamingPipelineSpec pins it against the oracled
   * q_growth_curve machinery). Across batches first-observation wins:
   * a late row with an earlier bucket arriving after its id was
   * emitted cannot retract the emission — append-only output, the
   * same latest-known contract as [[asofJoinStream]].
   *
   * State is ONE BOOLEAN per distinct id — the exact-distinct memory
   * floor (there is no cheaper exact answer). Where per-id exactness
   * isn't required at corpus scale, [[distinctWindowed]]'s HLL sketch
   * is the bounded-state alternative. Group with multiple keys by
   * packing them into the id (the cusum parity spec's code trick).
   */
  def firstSeenStream(df: DataFrame, idCol: String,
      bucketCol: String): Dataset[FirstSeenOut] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(bucketCol).cast("long").as("bucket")).as[FirstSeenRow]
      .groupByKey(_.id)
      .flatMapGroupsWithState[Boolean, FirstSeenOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: Long, it: Iterator[FirstSeenRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(FirstSeenOut(id, it.map(_.bucket).min))
          }
      }
  }

  /** One (gram, doc, event-time) observation; `ts` keeps the
    * watermarked column itself (a cast would strip the tag). */
  final case class GramNovRow(gram: String, id: Long, ts: java.sql.Timestamp)
  /** Per-(gram, doc) novelty verdict: `novel` iff this doc originates
    * the gram within the stream's active-vocabulary horizon. */
  final case class GramNovOut(gram: String, doc_id: Long, novel: Boolean)

  /**
   * Streaming n-gram novelty — the live face of
   * [[graft.pipeline.Stats.ngramNovelty]], the order-DEPENDENT audit a
   * batch recomputation can't answer incrementally (batch novelty is a
   * full re-scan per refresh; here each arriving document is judged
   * against everything that came before it, as it lands). Emits one
   * Append-mode row per (gram, document) pair: `novel = true` iff the
   * gram was never seen before this document arrived. A gram's
   * first-seen state is explicit — keyed by gram, one last-seen
   * event-time Long per distinct gram — so within a micro-batch the
   * MINIMUM doc id originates (the batch operator's `min(id)` origin),
   * and across batches first-arrival wins. A single batch over a
   * static frame therefore reproduces the batch classification exactly
   * ([[ngramNoveltyRollup]] of the emitted rows == `ngramNovelty`
   * row-for-row; StreamingPipelineSpec pins it).
   *
   * State is bounded by TTL, not history: each gram's state carries an
   * EVENT-TIME TIMEOUT at `last_seen + ttlMicros`, so once the
   * watermark passes a gram's horizon the state drops on the next
   * micro-batch. The trade is explicit: an evicted gram re-registers
   * as novel on its next sight — this is ACTIVE-VOCABULARY novelty
   * (novel vs the trailing `ttlMicros` of stream), the only exact
   * answer with bounded state; all-time novelty needs the exact
   * distinct-gram set (the [[firstSeenStream]] memory floor, which at
   * open-vocabulary corpus scale grows without bound). Size `ttlMicros`
   * to the boilerplate horizon that matters (a crawl's recrawl period,
   * a feed's dedup window). Batch frames have no watermark: timeouts
   * are inert and the call degrades to the exact single-batch audit.
   *
   * Per-document rollup (`n_grams, n_novel, novelty_permille`) is a
   * second aggregation — chain it in `foreachBatch` via
   * [[ngramNoveltyRollup]] (a groupBy downstream of
   * flatMapGroupsWithState in the same streaming query is a
   * multi-stateful shape Spark rejects outside append windows).
   *
   * Scale shape: one groupByKey shuffle on gram (the tfidf key);
   * state = one Long per gram in the TTL horizon; emission is
   * append-only, no retraction. Late rows beyond `watermarkDelay` drop
   * at the watermark like every event-time face here.
   */
  def ngramNoveltyStream(df: DataFrame, idCol: String, textCol: String,
      eventTimeCol: String, n: Int = 3, ttlMicros: Long = Long.MaxValue,
      watermarkDelay: String = "0 seconds"): Dataset[GramNovOut] = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(ttlMicros > 0, s"ttlMicros must be positive, got $ttlMicros")
    import df.sparkSession.implicits._
    import graft.expressions.{asColumn, asExpr}
    val streaming = df.isStreaming
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout // batch: no watermark to time against
    df.withWatermark(eventTimeCol, watermarkDelay)
      .select(
        explode(asColumn(DistinctNGramsOf(col(textCol), n))).as("gram"),
        col(idCol).cast("long").as("id"),
        col(eventTimeCol).as("ts"))
      .where(col("gram") =!= "").as[GramNovRow]
      .groupByKey(_.gram)
      .flatMapGroupsWithState[Long, GramNovOut](
        OutputMode.Append, timeout) {
        (gram: String, it: Iterator[GramNovRow], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // watermark passed last_seen + ttl: drop the gram from the
            // active vocabulary; its next sight is novel again
            state.remove()
            Iterator.empty
          } else {
            // min doc id originates within a batch — the batch
            // operator's min(id) contract; event time only drives TTL
            val rows = it.toSeq.sortBy(r => (r.id, unixMicros(r.ts)))
            val seen = state.exists
            val out = rows.iterator.zipWithIndex.map { case (r, i) =>
              GramNovOut(gram, r.id, !seen && i == 0)
            }.toVector
            val lastUs = rows.iterator.map(r => unixMicros(r.ts)).max
            state.update(math.max(state.getOption.getOrElse(Long.MinValue), lastUs))
            if (streaming) {
              // ceiling of (last_seen + ttl) in ms, clamped strictly
              // past the current watermark (monotonicity) and against
              // Long overflow for the keep-forever default
              val horizonUs =
                if (state.get > Long.MaxValue - ttlMicros) Long.MaxValue
                else state.get + ttlMicros
              val horizonMs =
                if (horizonUs >= Long.MaxValue - 999L) Long.MaxValue / 1000L
                else Math.floorDiv(horizonUs + 999L, 1000L)
              state.setTimeoutTimestamp(
                math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  /** Micro-batch epoch micros of a timestamp (driver/executor-side
    * scala — not the SQL function). */
  private def unixMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos % 1000000) / 1000L

  /** The per-doc distinct n-grams of a text column — the batch
    * operator's exact gram decomposition ([[graft.pipeline.Stats
    * .ngramNovelty]]'s DistinctNGrams over the whitespace split),
    * shared so the streaming face cannot drift from it. */
  private def DistinctNGramsOf(text: Column, n: Int) = {
    import graft.expressions.asExpr
    graft.pipeline.DistinctNGrams(asExpr(split(text, " ")), n)
  }

  /**
   * Roll [[ngramNoveltyStream]]'s per-(gram, doc) rows up to the batch
   * operator's per-document schema (`id, n_grams, n_novel,
   * novelty_permille`) — run inside `foreachBatch` (or over a
   * completed static result): a groupBy cannot chain after
   * flatMapGroupsWithState inside one streaming query.
   */
  def ngramNoveltyRollup(rows: Dataset[GramNovOut]): DataFrame =
    rows.toDF()
      .groupBy(col("doc_id").as("id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("novel"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_permille", expr("n_novel * 1000 div n_grams"))

  final case class DebounceRow(k: Long, t: Long, id: Long)
  final case class DebounceOut(key: Long, t: Long, id: Long,
      prev_gap: Option[Long], is_kept: Boolean)

  /**
   * Streaming debounce — the stateful face of
   * [[graft.pipeline.Temporal.debounce]], same LAG semantics: an event
   * is suppressed when it lands within `minGap` of the PREVIOUS event
   * on its key, where "previous" means last SEEN, not last kept (the
   * non-chained contract the batch operator documents). That contract
   * is exactly why the state is ONE long per key — the last seen
   * timestamp — where the chained rate-limiter would need the same
   * single long but different update rules.
   *
   * Within a micro-batch the group sorts by `(ts, id)` — the batch
   * operator's total order — so a single batch over a static frame
   * reproduces the batch rows exactly (StreamingPipelineSpec pins the
   * parity against the oracled q_debounce). Across batches feed
   * roughly in order: a late event gaps against the latest seen
   * timestamp at arrival (the monitoring trade, as in [[cusumStream]]).
   * Composite keys pack into the long id the usual way.
   */
  def debounceStream(df: DataFrame, key: String, tsCol: String,
      idCol: String, minGap: Long): Dataset[DebounceOut] = {
    require(minGap > 0, s"minGap must be positive, got $minGap")
    import df.sparkSession.implicits._
    df.select(col(key).cast("long").as("k"), col(tsCol).cast("long").as("t"),
        col(idCol).cast("long").as("id")).as[DebounceRow]
      .groupByKey(_.k)
      .flatMapGroupsWithState[Long, DebounceOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[DebounceRow], state: GroupState[Long]) =>
          var last: Option[Long] = state.getOption
          val out = Vector.newBuilder[DebounceOut]
          for (r <- it.toSeq.sortBy(x => (x.t, x.id))) {
            val gap = last.map(r.t - _)
            out += DebounceOut(k, r.t, r.id, gap, gap.forall(_ >= minGap))
            last = Some(r.t)
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** One metric point after projection. */
  final case class CusumRow(k: Long, t: Long, x: Long)
  /** Per-key state: both prefix sums and their running mins (the
    * closed-form carry of [[graft.pipeline.Stats.cusum]]) — four longs
    * per live key, O(1) regardless of series length. */
  final case class CusumSt(ph: Long, phMin: Long, pl: Long, plMin: Long)
  final case class CusumOut(key: Long, t: Long, x: Long,
      cusumHi: Long, cusumLo: Long, isChange: Boolean)

  /**
   * Streaming two-sided CUSUM — the stateful face of
   * [[graft.pipeline.Stats.cusum]]: the closed form
   * `S_t = P_t − min(0, min_{j≤t} P_j)` needs only the running prefix
   * sum and its min per side, so the state is FOUR longs per key —
   * no window, no history. Single-batch runs equal the batch operator
   * row-for-row (points sort by time in the group;
   * StreamingPipelineSpec pins the parity on random series).
   * `(key, orderCol)` must be unique, as in the batch operator; feed
   * roughly in order — a late point folds into the sums at arrival
   * (the standard monitoring trade).
   */
  def cusumStream(df: DataFrame, key: String, orderCol: String,
      valueCol: String, ref: Long, slack: Long, threshold: Long): Dataset[CusumOut] = {
    require(slack >= 0 && threshold > 0, "slack >= 0 and threshold > 0 required")
    import df.sparkSession.implicits._
    val rows = df.select(col(key).cast("long").as("k"),
      col(orderCol).cast("long").as("t"),
      col(valueCol).cast("long").as("x")).as[CusumRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[CusumSt, CusumOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[CusumRow], state: GroupState[CusumSt]) =>
          var st = state.getOption.getOrElse(CusumSt(0L, 0L, 0L, 0L))
          val out = Vector.newBuilder[CusumOut]
          for (r <- it.toSeq.sortBy(_.t)) {
            val ph = st.ph + (r.x - ref - slack)
            val pl = st.pl + (ref - r.x - slack)
            st = CusumSt(ph, math.min(st.phMin, ph), pl, math.min(st.plMin, pl))
            val hi = ph - math.min(0L, st.phMin)
            val lo = pl - math.min(0L, st.plMin)
            out += CusumOut(k, r.t, r.x, hi, lo, hi > threshold || lo > threshold)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** (key, order, value) projection for the Page–Hinkley detector. */
  final case class PhRow(k: Long, t: Long, x: Long)
  /** Per-key state: exactly 4 longs — prefix count, prefix sum, the
    * cumulative micro deviation m, and its prefix minimum. */
  final case class PhSt(n: Long, s: Long, m: Long, minM: Long)
  /** Per-row output: PH statistic against the prefix including this
    * row, and the alarm flag. */
  final case class PhOut(key: Long, t: Long, x: Long, nSoFar: Long,
      phMicro: Long, alarm: Boolean)

  /**
   * Streaming Page–Hinkley mean-shift detector — the live face of
   * [[graft.pipeline.Stats.pageHinkley]], the no-baseline cousin of
   * [[cusumStream]] (deviation from the RUNNING mean, not a fixed
   * reference). Per row: term = round(1e6·(x − s/n)) − δ, m += term,
   * PH = m − min m, alarm when PH > λ. The one double division (s/n)
   * and its HALF_UP rounding are written with BigDecimal
   * ties-away-from-zero — bit-identical to the batch operator's
   * `round` (java Math.round would disagree on negative .5 ties), so
   * a single micro-batch over a static frame reproduces the batch
   * face's final row per key (spec pins it).
   *
   * State is EXACTLY 4 longs per key — bounded regardless of stream
   * length; moments persist across batches and restarts (specs pin
   * both). Per-key in-order feed assumed (the [[cusumStream]] trade);
   * rows inside one batch sorted by `t`.
   */
  def pageHinkleyStream(df: DataFrame, key: String, orderCol: String,
      valueCol: String, deltaMicro: Long = 0L,
      lambdaMicro: Long): Dataset[PhOut] = {
    require(lambdaMicro > 0L, "lambdaMicro must be positive")
    import df.sparkSession.implicits._
    val rows = df.select(col(key).cast("long").as("k"),
      col(orderCol).cast("long").as("t"),
      col(valueCol).cast("long").as("x")).as[PhRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[PhSt, PhOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[PhRow], state: GroupState[PhSt]) =>
          var st = state.getOption.getOrElse(PhSt(0L, 0L, 0L, Long.MaxValue))
          val out = Vector.newBuilder[PhOut]
          for (r <- it.toSeq.sortBy(_.t)) {
            val n = st.n + 1
            val s = st.s + r.x
            // BigDecimal.valueOf (shortest-string) + HALF_UP is what
            // Spark's Round does on doubles — exact parity with the
            // batch operator's term
            val term = java.math.BigDecimal.valueOf(
              1e6 * (r.x.toDouble - s.toDouble / n.toDouble))
              .setScale(0, java.math.RoundingMode.HALF_UP)
              .longValueExact() - deltaMicro
            val m = st.m + term
            val minM = math.min(st.minM, m)
            st = PhSt(n, s, m, minM)
            val ph = m - minM
            out += PhOut(k, r.t, r.x, n, ph, ph > lambdaMicro)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** (key, value) projection for the quantile monitor. */
  final case class QuantRow(k: Long, v: Long)
  /** Per-key state: the cumulative value histogram as parallel
    * arrays — ≤ maxBins pairs by the fail-loud cap. */
  final case class QuantSt(vs: Array[Long], cs: Array[Long])
  /** Per-batch output: exact discrete percentiles of everything seen
    * so far (the percentileReport rule). */
  final case class QuantOut(key: Long, n: Long, p500: Long, p900: Long,
      p990: Long)

  /**
   * Streaming exact-quantile monitor — the live face of
   * [[graft.pipeline.Stats.percentileReport]]: per key the state is
   * the cumulative DISTINCT-value histogram (quantize upstream with
   * [[graft.pipeline.Stats.quantizeStep]]; past `maxBins` distinct
   * values the query fails loud with a named diagnosis, the
   * [[driftStream]] contract), and each batch emits the EXACT
   * discrete p50/p90/p99 of everything seen so far under the batch
   * operator's rule — smallest v with cume·1000 ≥ n·p — so a single
   * micro-batch over a static frame reproduces percentileReport
   * row-for-row (spec pins it). NULL key/value rows excluded as in
   * batch. State ≤ maxBins (value, count) pairs per key.
   */
  def quantileStream(df: DataFrame, key: String, valueCol: String,
      maxBins: Int = 4096): Dataset[QuantOut] = {
    require(maxBins >= 2 && maxBins <= 65536,
      s"maxBins must be in [2, 65536], got $maxBins")
    import df.sparkSession.implicits._
    val rows = df
      .where(col(key).isNotNull && col(valueCol).isNotNull)
      .select(col(key).cast("long").as("k"),
        col(valueCol).cast("long").as("v")).as[QuantRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[QuantSt, QuantOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[QuantRow], state: GroupState[QuantSt]) =>
          val hist = scala.collection.mutable.LongMap.empty[Long]
          state.getOption.foreach(st =>
            st.vs.indices.foreach(i => hist(st.vs(i)) = st.cs(i)))
          it.foreach(r => hist(r.v) = hist.getOrElse(r.v, 0L) + 1L)
          if (hist.size > maxBins) throw new IllegalArgumentException(
            s"quantile_stream: key $k grew ${hist.size} distinct " +
              s"values, cap is $maxBins — quantize the metric coarser " +
              "upstream (Stats.quantizeStep)")
          val values = hist.keys.toArray.sorted
          val n = hist.values.sum
          def pct(p: Long): Long = {
            var cume = 0L; var i = 0
            while (i < values.length) {
              cume += hist(values(i))
              if (cume * 1000L >= n * p) return values(i)
              i += 1
            }
            values.last
          }
          val sorted = values
          state.update(QuantSt(sorted, sorted.map(hist)))
          Iterator.single(QuantOut(k, n, pct(500), pct(900), pct(990)))
      }
  }

  /** (key, id) projection for the streaming reservoir. */
  final case class ResRow(k: Long, id: Long)
  /** Per-key state: the ≤ k current (priority, id) winners, sorted,
    * plus the total rows seen — bounded at k pairs + 1 long. */
  final case class ResSt(items: Seq[(Long, Long)], seen: Long)
  /** Per-batch output: the CURRENT sample after this batch. */
  final case class ResOut(key: Long, id: Long, priority: Long,
      nSeen: Long)

  /**
   * Streaming bounded k-sample per key — the live face of
   * [[graft.pipeline.Training.prioritySamplePerKey]]: every id's
   * priority is the SAME seedless `mix64(id) & Long.MaxValue`, and
   * the state keeps only the k smallest (priority, id) pairs, so
   * after ANY prefix of the stream the emitted sample is
   * BIT-IDENTICAL to the batch operator over that prefix (spec pins
   * it) — a property random-eviction reservoirs cannot offer.
   * Duplicate ids collapse (same priority, id — set semantics).
   *
   * Emits the current k winners after each batch, tagged with the
   * cumulative `nSeen`. State is ≤ k pairs + 1 long per key —
   * bounded regardless of stream length; survives restarts via the
   * checkpoint (spec pins recovery).
   */
  def reservoirStream(df: DataFrame, key: String, idCol: String,
      k: Int): Dataset[ResOut] = {
    require(k >= 1 && k <= 65536, s"k must be in [1, 65536], got $k")
    import df.sparkSession.implicits._
    val rows = df.select(col(key).cast("long").as("k"),
      col(idCol).cast("long").as("id")).as[ResRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[ResSt, ResOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (kk: Long, it: Iterator[ResRow], state: GroupState[ResSt]) =>
          var st = state.getOption.getOrElse(ResSt(Vector.empty, 0L))
          var items = st.items.toVector
          var seen = st.seen
          for (r <- it) {
            seen += 1
            val p = graft.pipeline.Hashing.mix64(r.id) & Long.MaxValue
            val cand = (p, r.id)
            if (!items.contains(cand)) {
              if (items.length < k) items = (items :+ cand).sorted
              else if (implicitly[Ordering[(Long, Long)]]
                  .lt(cand, items.last))
                items = (items.init :+ cand).sorted
            }
          }
          state.update(ResSt(items, seen))
          items.iterator.map { case (p, id) => ResOut(kk, id, p, seen) }
      }
  }

  /** (key, order, value) projection for the running z-gate. */
  final case class ZRow(k: Long, t: Long, x: Long)
  /** Per-key state: the three exact integer moments — 3 longs. */
  final case class ZSt(n: Long, s: Long, ssq: Long)
  /** Per-row output: value, prefix count, and the division-cleared
    * z-gate flag against the moments INCLUDING this row. */
  final case class ZOut(key: Long, t: Long, x: Long, nSoFar: Long,
      isAnomaly: Boolean)

  /**
   * Streaming running-moments z-gate — the live face of
   * [[graft.pipeline.Stats.anomalyFlags]], with the one semantic a
   * stream forces: each row is judged against the moments of the
   * PREFIX up to and including itself (a stream cannot see the
   * future), where the batch operator uses the whole group. Same
   * division-cleared exact integer test, so no float accumulation
   * ever: `kDen²·(n·v − s)² > kNum²·(n·ssq − s²)`. Rows in singleton
   * prefixes never flag (z undefined — the batch contract). State is
   * THREE longs per key; overflow contract as the batch operator
   * (kNum²·N·V² < 2^63 — pre-scale coarser for wide regimes).
   *
   * Cross-batch: moments persist, so a restart continues the same
   * prefix (spec pins it); per-key in-order feed assumed (the
   * [[cusumStream]] trade), rows inside one batch sorted by `t`.
   */
  def anomalyStream(df: DataFrame, key: String, orderCol: String,
      valueCol: String, kNum: Int = 2, kDen: Int = 1): Dataset[ZOut] = {
    require(kNum > 0 && kDen > 0, s"k must be positive, got $kNum/$kDen")
    import df.sparkSession.implicits._
    val rows = df.select(col(key).cast("long").as("k"),
      col(orderCol).cast("long").as("t"),
      col(valueCol).cast("long").as("x")).as[ZRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[ZSt, ZOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[ZRow], state: GroupState[ZSt]) =>
          var st = state.getOption.getOrElse(ZSt(0L, 0L, 0L))
          val out = Vector.newBuilder[ZOut]
          for (r <- it.toSeq.sortBy(_.t)) {
            st = ZSt(st.n + 1, st.s + r.x, st.ssq + r.x * r.x)
            val dev = st.n * r.x - st.s
            val varN2 = st.n * st.ssq - st.s * st.s
            val flag = kDen.toLong * kDen * dev * dev >
              kNum.toLong * kNum * varN2
            out += ZOut(k, r.t, r.x, st.n, flag)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** (key, order, value) projection for the EWMA smoother. */
  final case class EwmaRow(k: Long, t: Long, x: Long)
  /** Per-key state: the most-recent-first previous values, ≤ lags−1
    * longs — the entire memory the truncated EWMA needs. */
  final case class EwmaSt(recent: Seq[Long])
  /** Per-row output: the input plus the exact integer EWMA. */
  final case class EwmaOut(key: Long, t: Long, x: Long, ewmaMilli: Long)

  /**
   * Streaming truncated EWMA — the stateful face of
   * [[graft.pipeline.Temporal.ewmaSmooth]]: per key, the state store
   * keeps only the last `lags−1` values, and every arriving row emits
   * `1000·Σ vₖ·2^(L−1−k) div Σ 2^(L−1−k)` over the values that exist —
   * bit-identical to the batch lag-window operator (series heads
   * renormalize the denominator the same way; JVM long division and
   * Spark `div` both truncate toward zero). A single micro-batch over
   * a static frame reproduces the batch operator row-for-row
   * (StreamingPipelineSpec pins the parity).
   *
   * Cross-batch semantics assume the per-key feed is in order within
   * the stream (the [[cusumStream]] trade); rows inside one batch are
   * sorted by `orderCol` before folding. State is ≤ lags−1 longs per
   * key — bounded regardless of stream length.
   */
  def ewmaStream(df: DataFrame, key: String, orderCol: String,
      valueCol: String, lags: Int = 8): Dataset[EwmaOut] = {
    require(lags >= 1 && lags <= 16, s"lags must be in [1,16], got $lags")
    import df.sparkSession.implicits._
    val rows = df.select(col(key).cast("long").as("k"),
      col(orderCol).cast("long").as("t"),
      col(valueCol).cast("long").as("x")).as[EwmaRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[EwmaSt, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[EwmaRow], state: GroupState[EwmaSt]) =>
          var recent = state.getOption.map(_.recent).getOrElse(Seq.empty)
          val out = Vector.newBuilder[EwmaOut]
          for (r <- it.toSeq.sortBy(_.t)) {
            val values = (r.x +: recent).take(lags) // most recent first
            var num = 0L; var den = 0L; var i = 0
            while (i < values.length) {
              val wt = 1L << (lags - 1 - i)
              num += values(i) * wt; den += wt; i += 1
            }
            out += EwmaOut(k, r.t, r.x, 1000L * num / den)
            recent = (r.x +: recent).take(lags - 1)
          }
          state.update(EwmaSt(recent))
          out.result().iterator
      }
  }

  /** (key, order, outcome) projection for the SPRT monitor. */
  final case class SprtRow(k: String, t: Long, x: Boolean)
  /** Per-key state: exact LLR micro-nats, trial count, latched verdict
    * (0 undecided / 1 h1 / 2 h0) and its trial index — four scalars,
    * bounded regardless of stream length. */
  final case class SprtSt(llr: Long, n: Long, decided: Int, decidedAt: Long)
  /** Per-row verdict: running LLR and the (latched) decision. */
  final case class SprtOut(key: String, t: Long, n: Long, llrMicro: Long,
      decision: String, decidedAt: Option[Long])

  /**
   * Streaming Wald SPRT — the live face of
   * [[graft.pipeline.Stats.sprt]]: every arriving bernoulli outcome
   * advances the key's exact micro-nat log-likelihood ratio (the same
   * four plan-time constants as the batch operator —
   * [[graft.pipeline.Stats.sprtConstantsMicro]]), and the FIRST
   * boundary crossing latches the verdict, exactly the "stop the A/B
   * the moment the evidence clears the bar" loop sequential testing
   * exists for. Rows after the crossing keep accumulating LLR but
   * carry the latched decision, so a single micro-batch over a static
   * frame ends each key at the batch operator's
   * (n, decision, decided_at, llr_final) — spec-pinned parity.
   *
   * Cross-batch semantics assume the per-key feed is in order within
   * the stream (the [[cusumStream]]/[[ewmaStream]] trade); rows
   * inside one batch are sorted by `orderCol` before folding. State
   * is FOUR scalars per key; the latch survives checkpoint restarts.
   */
  def sprtStream(df: DataFrame, key: String, orderCol: String,
      successCol: String, p0Permille: Int = 500, p1Permille: Int = 600,
      alphaPermille: Int = 50, betaPermille: Int = 50): Dataset[SprtOut] = {
    import df.sparkSession.implicits._
    val Seq(lpS, lpF, aUp, bLo) = graft.pipeline.Stats.sprtConstantsMicro(
      p0Permille, p1Permille, alphaPermille, betaPermille)
    val rows = df.select(col(key).cast("string").as("k"),
      col(orderCol).cast("long").as("t"),
      col(successCol).cast("boolean").as("x")).as[SprtRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[SprtSt, SprtOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[SprtRow], state: GroupState[SprtSt]) =>
          var st = state.getOption.getOrElse(SprtSt(0L, 0L, 0, -1L))
          val out = Vector.newBuilder[SprtOut]
          for (r <- it.toSeq.sortBy(_.t)) {
            st = st.copy(llr = st.llr + (if (r.x) lpS else lpF), n = st.n + 1)
            if (st.decided == 0) {
              if (st.llr >= aUp) st = st.copy(decided = 1, decidedAt = st.n)
              else if (st.llr <= bLo) st = st.copy(decided = 2, decidedAt = st.n)
            }
            val d = st.decided match {
              case 1 => "accept_h1"
              case 2 => "accept_h0"
              case _ => "continue"
            }
            out += SprtOut(k, r.t, st.n, st.llr, d,
              if (st.decided == 0) None else Some(st.decidedAt))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** (key, ts) projection for the gap-regularity monitor. */
  final case class GapRow(k: Long, t: Long)
  /** Per-key state: last seen timestamp + the three gap moments — 4
    * longs, the smallest possible cadence memory. */
  final case class GapSt(last: Long, n: Long, s: Long, ssq: Long)
  /** Per-key report row (one per key per batch that touched it). */
  final case class GapOut(key: Long, nGaps: Long, gapSum: Long,
      gapSsq: Long, varN2: Long, isRobotic: Boolean)

  /**
   * Streaming cadence-regularity monitor — the stateful face of
   * [[graft.pipeline.Stats.gapRegularity]]: per key, the state store
   * keeps `(last_ts, n, Σgap, Σgap²)` and every batch emits the key's
   * updated moments plus the division-cleared CV² flag
   * (`kDen·(n·ssq − s²) < kNum·s²`, zero-gap metronome short-circuit,
   * `minGaps` floor) — live bot detection with FOUR LONGS of state per
   * key, the incremental form of the batch lag-window + moment
   * aggregate. A single micro-batch over a static frame reproduces the
   * batch operator row-for-row (StreamingPipelineSpec pins the parity
   * against the oracled q_gap_regularity machinery).
   *
   * Cross-batch semantics assume the per-key feed is in order (the
   * [[cusumStream]] trade): a late event would produce one negative
   * gap where the batch operator's global sort would not. Keys with a
   * single event so far carry state but emit nothing (no gap exists —
   * matching the batch WHERE on the lag).
   */
  def gapRegularityStream(df: DataFrame, key: String, tsCol: String,
      divisor: Long = 1000000L, kNum: Int = 1, kDen: Int = 10,
      minGaps: Int = 5): Dataset[GapOut] = {
    require(divisor > 0 && kNum > 0 && kDen > 0 && minGaps >= 1,
      "divisor, kNum, kDen, minGaps must be positive")
    import df.sparkSession.implicits._
    val rows = df.select(col(key).cast("long").as("k"),
      col(tsCol).cast("long").as("t")).as[GapRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[GapSt, GapOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[GapRow], state: GroupState[GapSt]) =>
          var st = state.getOption.getOrElse(GapSt(Long.MinValue, 0L, 0L, 0L))
          for (r <- it.toSeq.sortBy(_.t)) {
            if (st.last != Long.MinValue) {
              // sorted feed ⇒ gap ≥ 0, so / matches the batch `div`
              val gap = (r.t - st.last) / divisor
              st = GapSt(r.t, st.n + 1L, st.s + gap, st.ssq + gap * gap)
            } else st = st.copy(last = r.t)
          }
          state.update(st)
          if (st.n == 0L) Iterator.empty
          else {
            val varN2 = st.n * st.ssq - st.s * st.s
            val robotic = st.n >= minGaps &&
              (st.s == 0L || varN2 * kDen < st.s * st.s * kNum)
            Iterator.single(GapOut(k, st.n, st.s, st.ssq, varN2, robotic))
          }
      }
  }

  /** One event after touch/conversion projection. */
  final case class AttrRow(k: Long, t: Long, id: Long, tp: String, conv: Boolean)
  /** Per-key state: touches still inside any future conversion's
    * lookback (pruned to `maxSeen - lookback` each batch). */
  final case class AttrSt(touches: Seq[(Long, Long, String)], maxSeen: Long)
  /** One attribution row per conversion event (append-mode). */
  final case class AttrOut(conversionId: Long, key: Long, convTs: Long,
      firstTouchId: Option[Long], firstTouchType: Option[String],
      firstTouchTs: Option[Long], lastTouchId: Option[Long],
      lastTouchType: Option[String], lastTouchTs: Option[Long])

  /**
   * Streaming multi-touch attribution — the stateful face of
   * [[graft.pipeline.Temporal.attribution]]: per key, the state store
   * carries the touches still inside any future conversion's trailing
   * `lookbackMicros` window; each conversion emits its first/last
   * touch on arrival. A single micro-batch over a static frame equals
   * the batch operator row-for-row (events sort by `(t, id)` in the
   * group, replaying the batch range-frame's lexicographic tie-break;
   * StreamingPipelineSpec pins the parity).
   *
   * State is bounded by the per-key touch rate × lookback — the same
   * horizon the batch range frame reads — pruned against the key's
   * max seen time each batch. Cross-batch semantics are
   * attribute-with-known: a touch arriving AFTER its conversion was
   * processed does not retroactively re-attribute (the
   * [[asofJoinStream]] trade); feed roughly in order where exact
   * parity matters.
   */
  def attributionStream(df: DataFrame, key: String, idCol: String,
      tsCol: String, typeCol: String, conversionType: String,
      touchTypes: Seq[String], lookbackMicros: Long): Dataset[AttrOut] = {
    require(lookbackMicros > 0, "lookbackMicros must be positive")
    require(!touchTypes.contains(conversionType),
      "conversionType cannot also be a touch type")
    import df.sparkSession.implicits._
    val rows = df.select(col(key).cast("long").as("k"),
        graft.pipeline.Temporal.epochMicros(df, tsCol).as("t"),
        col(idCol).cast("long").as("id"), col(typeCol).as("tp"),
        (col(typeCol) === conversionType).as("conv"))
      .where(col("conv") || col(typeCol).isin(touchTypes: _*))
      .as[AttrRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[AttrSt, AttrOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[AttrRow], state: GroupState[AttrSt]) =>
          val st = state.getOption.getOrElse(AttrSt(Seq.empty, Long.MinValue))
          var touches = st.touches.toVector
          var maxSeen = st.maxSeen
          val out = Vector.newBuilder[AttrOut]
          for (r <- it.toSeq.sortBy(x => (x.t, x.id))) {
            maxSeen = math.max(maxSeen, r.t)
            if (r.conv) {
              val in = touches.filter(x => x._1 >= r.t - lookbackMicros && x._1 < r.t)
              if (in.isEmpty)
                out += AttrOut(r.id, k, r.t, None, None, None, None, None, None)
              else {
                val f = in.min
                val l = in.max
                out += AttrOut(r.id, k, r.t, Some(f._2), Some(f._3), Some(f._1),
                  Some(l._2), Some(l._3), Some(l._1))
              }
            } else touches :+= ((r.t, r.id, r.tp))
          }
          touches = touches.filter(_._1 >= maxSeen - lookbackMicros)
          state.update(AttrSt(touches, maxSeen))
          out.result().iterator
      }
  }

  /**
   * Stream-stream interval join: pair each point event with every span
   * `[start, end)` of the same key, the streaming face of
   * [[graft.pipeline.Temporal.intervalJoin]] (same half-open
   * containment, span columns prefixed `span_`).
   *
   * Spark-first: this is the built-in watermarked stream-stream join —
   * no custom state code. Both sides carry a watermark, and the
   * REDUNDANT `ts <= start + maxSpan` conjunct is what lets the engine
   * derive a state watermark for each side (the `ts < end` bound
   * relates ts to a non-watermarked payload column, which the state
   * manager cannot reason about), so buffered rows are evicted once
   * they can no longer match — state is bounded by
   * `watermark + maxSpan`, not by stream length. `maxSpan` must be an
   * upper bound on span length (spans longer than it lose matches past
   * the bound — assert it from the span generator, don't guess).
   *
   * Timestamps are TIMESTAMP columns here (event time), where the
   * batch operator uses numeric micros: watermarks only attach to
   * event-time columns.
   */
  def intervalJoinStream(points: DataFrame, spans: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      watermark: String = "10 minutes", maxSpan: String = "1 hour"): DataFrame = {
    val p = points.withWatermark(tsCol, watermark)
    val sp = spans
      .select(spans.columns.toSeq.map(c => col(c).as("span_" + c)): _*)
      .withWatermark("span_" + startCol, watermark)
    p.join(sp,
        col(key) === col("span_" + key) &&
          col(tsCol) >= col("span_" + startCol) &&
          col(tsCol) < col("span_" + endCol) &&
          col(tsCol) <= col("span_" + startCol) + expr(s"INTERVAL $maxSpan"))
      .drop("span_" + key)
  }

  /**
   * Event sessionization with the BUILT-IN `session_window` aggregation
   * (Spark-first: no custom state code — the dynamic-gap session
   * operator ships with Structured Streaming and its state is
   * watermark-bounded). Sessions close after `gap` of inactivity;
   * output is one row per (key, session) with event count, value sum
   * and the session bounds. Works identically on a batch DataFrame
   * (same call, no watermark needed) — the batch/streaming parity the
   * rest of the library keeps.
   */
  def sessionize(df: DataFrame, keyCol: String, eventTimeCol: String,
      valueCol: String, gap: String, watermark: Option[String] = None): DataFrame = {
    val typed = df.withColumn(eventTimeCol, eventTime(df, eventTimeCol))
    val src = watermark.fold(typed)(w => typed.withWatermark(eventTimeCol, w))
    src.groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))
  }

  /** [[sessionize]] with only exactly-reproducible aggregates (count,
    * min, max — no float summation order to disagree on) and integer
    * epoch-micros session bounds: the oracle-checkable face of the
    * session operator. `session_end` = last event + gap, and an event at
    * exactly `gap` after the previous one still MERGES into the session
    * (the interval is closed at its end); only a strictly larger gap
    * starts a new session. */
  /** Event-time column as a TIMESTAMP, schema-adaptively: TIMESTAMP
    * passes through, TIMESTAMP_NTZ is cast in the session timezone
    * (graft sessions pin UTC), numeric is taken as epoch MICROS — the
    * typed-axis twin of [[graft.pipeline.Temporal.epochMicros]] for
    * operators built on `session_window`/watermarks, so callers never
    * have to pre-convert (the round-9 regression class). */
  private def eventTime(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.TimestampType => col(c)
      case org.apache.spark.sql.types.TimestampNTZType =>
        col(c).cast(org.apache.spark.sql.types.TimestampType)
      case _: org.apache.spark.sql.types.NumericType =>
        timestamp_micros(col(c).cast("long"))
      case other => throw new IllegalArgumentException(
        s"column $c: expected TIMESTAMP, TIMESTAMP_NTZ or numeric epoch micros, got $other")
    }

  def sessionStats(df: DataFrame, keyCol: String, eventTimeCol: String,
      valueCol: String, gap: String): DataFrame =
    df.withColumn(eventTimeCol, eventTime(df, eventTimeCol))
      .groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"),
        min(col(valueCol)).as("min_value"), max(col(valueCol)).as("max_value"))
      .select(col(keyCol),
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("n_events"), col("min_value"), col("max_value"))

  /** OHLC time-bucket downsample over tumbling event-time windows — the
    * streaming face of [[graft.pipeline.Temporal.resample]]: identical
    * rows to the batch operator when `width` equals its `bucketWidth`
    * (tumbling windows align to the epoch, like integer floor-division;
    * StreamingPipelineSpec pins the parity). Under `readStream`, add a
    * watermark upstream and the windowed aggregate emits finalized
    * buckets; open/close are min/max over `struct(ts, value)`, which
    * combine associatively, so state-store merges agree with the batch
    * plan for any micro-batch interleaving. */
  def resampleStream(df: DataFrame, keyCol: String, eventTimeCol: String,
      valueCol: String, width: String): DataFrame =
    df.withColumn(eventTimeCol, eventTime(df, eventTimeCol))
      .groupBy(col(keyCol), window(col(eventTimeCol), width))
      .agg(
        min(struct(col(eventTimeCol), col(valueCol))).as("__graft_o"),
        max(struct(col(eventTimeCol), col(valueCol))).as("__graft_c"),
        min(col(valueCol)).as("low"), max(col(valueCol)).as("high"),
        count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col(keyCol),
        unix_micros(col("window.start")).as("bucket_start"),
        col(s"__graft_o.$valueCol").as("open"), col("high"), col("low"),
        col(s"__graft_c.$valueCol").as("close"), col("n"), col("total"))

  /** Running per-key corpus stats carried in the state store. */
  final case class CorpusStats(key: String, docs: Long, chars: Long, maxChars: Long)

  /**
   * Custom running state with mapGroupsWithState: per-key document and
   * character counts that persist across micro-batches (the
   * KeyValueGroupedDataset custom-state shape; state = one small struct
   * per key, independent of rows seen).
   */
  def runningCorpusStats(docs: Dataset[(String, String)]): Dataset[CorpusStats] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_._1)
      .mapGroupsWithState[CorpusStats, CorpusStats](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[CorpusStats]) =>
          val prev = state.getOption.getOrElse(CorpusStats(key, 0L, 0L, 0L))
          var docsN = prev.docs
          var chars = prev.chars
          var mx = prev.maxChars
          rows.foreach { case (_, text) =>
            docsN += 1
            chars += text.length.toLong
            mx = math.max(mx, text.length.toLong)
          }
          val next = CorpusStats(key, docsN, chars, mx)
          state.update(next)
          next
      }
  }

  /** (key, quantized value) projection for the drift monitor. */
  /** (key, micro-probability, label) projection for the calibration
    * monitor. */
  final case class CalRow(k: Long, p: Long, y: Boolean)
  /** Per-key state: per-bin (n, n_pos, conf_sum) — exactly `bins`
    * slots, bounded by construction. */
  final case class CalSt(n: Array[Long], pos: Array[Long], conf: Array[Long])
  /** One report per key per batch that touched it. */
  final case class CalOut(key: Long, nTotal: Long, eceMicro: Long,
      worstBin: Int, worstGapMicro: Long)

  /**
   * Streaming calibration monitor — the live face of
   * [[graft.pipeline.Stats.calibrationReport]]: per key, the
   * CUMULATIVE per-bin (count, positives, confidence-sum) triple of
   * everything seen so far is re-scored after every micro-batch with
   * the batch operator's exact integer arithmetic
   * (ECE_micro = Σ_b |10⁶·pos_b − conf_b| div N, bin = p·bins div 10⁶
   * clamped to the last bin), plus the worst bin and its per-row gap
   * (|10⁶·pos − conf| div n_b — where to look when the alarm fires).
   * State is EXACTLY 3·`bins` longs per key — bounded by construction,
   * no cap to trip (the [[driftStream]] contract without the
   * quantization trap: the bin index is computed, not caller-chosen).
   * NULL key/probability/label rows are excluded (the batch contract).
   */
  def calibrationStream(df: DataFrame, key: String, pMicroCol: String,
      labelCol: String, bins: Int = 10): Dataset[CalOut] = {
    require(bins >= 2 && bins <= 1000, s"bins must be in [2,1000], got $bins")
    import df.sparkSession.implicits._
    val rows = df
      .where(col(key).isNotNull && col(pMicroCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(key).cast("long").as("k"),
        col(pMicroCol).cast("long").as("p"),
        col(labelCol).cast("boolean").as("y")).as[CalRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[CalSt, CalOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[CalRow], state: GroupState[CalSt]) =>
          val st = state.getOption.getOrElse(CalSt(
            new Array[Long](bins), new Array[Long](bins),
            new Array[Long](bins)))
          it.foreach { r =>
            // fail loud with a named diagnosis, not a negative array
            // index: p is a probability in micro units by contract
            if (r.p < 0L || r.p > 1000000L) throw new IllegalArgumentException(
              s"calibration_stream: key $k saw p_micro=${r.p}, outside " +
                "[0, 1000000] — probabilities must be micro-unit scaled")
            val b = math.min(r.p * bins / 1000000L, bins - 1L).toInt
            st.n(b) += 1L
            if (r.y) st.pos(b) += 1L
            st.conf(b) += r.p
          }
          var nTot = 0L; var gapSum = 0L
          var worst = 0; var worstGap = -1L
          var b = 0
          while (b < bins) {
            nTot += st.n(b)
            val gap = math.abs(st.pos(b) * 1000000L - st.conf(b))
            gapSum += gap
            if (st.n(b) > 0L) {
              val perRow = gap / st.n(b)
              if (perRow > worstGap) { worstGap = perRow; worst = b }
            }
            b += 1
          }
          state.update(st)
          if (nTot == 0L) Iterator.empty
          else Iterator.single(CalOut(k, nTot, gapSum / nTot, worst,
            math.max(worstGap, 0L)))
      }
  }

  final case class DriftRow(k: Long, v: Long)
  /** Per-key state: the ACTIVE quantized histogram (sorted values +
    * counts) — bounded by `maxBins` by contract, enforced loudly. */
  final case class DriftSt(vs: Array[Long], cs: Array[Long])
  /** One report per key per batch that touched it. */
  final case class DriftOut(key: Long, nCur: Long, w1Micro: Long,
      tvPpm: Long, cvmMicro: Long)

  /**
   * Streaming distribution-drift monitor — the live face of
   * [[graft.pipeline.Stats.distributionDistance]]: per key, the
   * cumulative quantized histogram of everything seen so far is scored
   * against a FIXED reference histogram after every micro-batch,
   * emitting the same three statistics with the same arithmetic
   * (exact cross-multiplied CDF gaps via BigInt, one floor division
   * for W₁/TV, per-value nano-rounded CvM terms — spec-pinned parity
   * with the batch operator on a single batch).
   *
   * The reference is a DRIVER-SIDE (value, count) list — the
   * metadata-sized artifact of an upstream histogram job — and per-key
   * state is the current histogram, both bounded by `maxBins`
   * (quantize upstream; a key whose distinct values exceed the cap
   * fails the batch loudly rather than growing state without bound —
   * the streaming analog of [[graft.pipeline.Stats.kendallTau]]'s
   * cell guard). The quantization width is SCALE-SENSITIVE — compute
   * it from a bounded sample/reference batch with
   * [[graft.pipeline.Stats.quantizeStep]] rather than hand-picking
   * (a width safe at one scale detonates the cap at 10×).
   */
  def driftStream(df: DataFrame, key: String, valueCol: String,
      refHist: Seq[(Long, Long)], maxBins: Int = 4096): Dataset[DriftOut] = {
    require(refHist.nonEmpty, "reference histogram must not be empty")
    require(refHist.size <= maxBins,
      s"reference histogram has ${refHist.size} bins, cap is $maxBins")
    require(refHist.forall(_._2 > 0L), "reference counts must be positive")
    import df.sparkSession.implicits._
    val refMap = refHist.toMap
    val na = refHist.map(_._2).sum
    // match the batch operator's NULL contract: exclude NULL key/value
    // rows (the encoder would otherwise fail the batch on nullable input)
    val rows = df
      .where(col(key).isNotNull && col(valueCol).isNotNull)
      .select(col(key).cast("long").as("k"),
        col(valueCol).cast("long").as("v")).as[DriftRow]
    rows.groupByKey(_.k)
      .flatMapGroupsWithState[DriftSt, DriftOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[DriftRow], state: GroupState[DriftSt]) =>
          val hist = scala.collection.mutable.LongMap.empty[Long]
          state.getOption.foreach(st =>
            st.vs.indices.foreach(i => hist(st.vs(i)) = st.cs(i)))
          it.foreach(r => hist(r.v) = hist.getOrElse(r.v, 0L) + 1L)
          if (hist.size > maxBins) throw new IllegalArgumentException(
            s"drift_stream: key $k grew ${hist.size} distinct values, " +
              s"cap is $maxBins — quantize the metric coarser upstream")
          val values = (refMap.keySet ++ hist.keySet).toArray.sorted
          val nb = hist.values.sum
          val naB = BigInt(na); val nbB = BigInt(nb)
          var cuma = 0L; var cumb = 0L
          var w1num = BigInt(0); var tvnum = BigInt(0); var cvmNano = BigInt(0)
          var i = 0
          while (i < values.length) {
            val ca = refMap.getOrElse(values(i), 0L)
            val cb = hist.getOrElse(values(i), 0L)
            cuma += ca; cumb += cb
            val gap = (BigInt(cuma) * nbB - BigInt(cumb) * naB).abs
            tvnum += (BigInt(ca) * nbB - BigInt(cb) * naB).abs
            if (i + 1 < values.length)
              w1num += gap * (values(i + 1) - values(i))
            // the batch operator's per-value nano term, same factoring:
            // round(1e9 * gd * gd * (ca+cb)) with gd = gap/(na*nb)
            val gd = gap.toDouble / (naB * nbB).toDouble
            cvmNano += BigInt(math.round(1e9 * gd * gd * (ca + cb).toDouble))
            i += 1
          }
          val vs = hist.keys.toArray.sorted
          state.update(DriftSt(vs, vs.map(hist)))
          Iterator.single(DriftOut(k, nb,
            (w1num * 1000000 / (naB * nbB)).toLong,
            (tvnum * 500000 / (naB * nbB)).toLong,
            (cvmNano / (1000 * (naB + nbB))).toLong))
      }
  }
}
