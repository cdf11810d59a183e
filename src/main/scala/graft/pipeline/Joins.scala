package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Shuffle-shaping join helpers for the hostile end of the 100 TB case:
 * the equi-join whose key histogram is so skewed that one reducer gets
 * a material fraction of the fact table, and the changelog compaction
 * that every CDC / snapshot ingest needs before anything else runs.
 *
 * Both operators are row-identical to their naive formulations — the
 * whole point is to change the PHYSICAL shuffle shape without touching
 * the logical result, so each ships with an oracle query pinning it to
 * the plain-SQL twin (q_salted_join, q_compact).
 *
 * The reference engine has no join surface beyond its spatial join
 * (`extensions/RasterJoin.scala:40-133`); these follow the same design
 * recipe as [[graft.RasterJoin.bucketed]] and
 * [[Temporal.asofJoinBucketed]]: manufacture a finer equi-key so no
 * single reducer owns a whole hot key.
 */
object Joins {

  /**
   * Skew-salted inner equi-join: row-identical to
   * `big.join(small, key)` but with every hot key's rows spread across
   * `salts` reducers.
   *
   * Mechanics: each big-side row gets a deterministic salt in
   * `[0, salts)` (`xxhash64` of the whole row — any per-row value
   * works, the result never depends on it); the small side is
   * replicated once per salt value with a generator (no driver loop,
   * no broadcast requirement). The join key becomes `(key, salt)`, so
   * a key holding 20% of a 100 TB fact table fans out over `salts`
   * tasks instead of serializing one reducer. Correctness is
   * unconditional — for any multiplicities, each (bigRow, smallRow)
   * pair meets exactly once, in the big row's salt bucket.
   *
   * Cost model: small side shuffles ×`salts` — use when BOTH sides are
   * too large to broadcast (else `broadcast(small)` needs no salt at
   * all) and the big side is skewed. AQE's skew-join split handles
   * mid-size skew adaptively; explicit salting is for the planned-for
   * case (known hot keys, deterministic task sizing) and for engines /
   * modes where AQE cannot split (e.g. a sort-merge join feeding a
   * window over the same key). Prefer `salts` ≈ hot-key rows ÷ target
   * partition rows, capped by cluster parallelism.
   *
   * Output columns: `key`, then big-side payload, then small-side
   * payload (the `join ... using` layout). Payload name collisions
   * across sides are the caller's to resolve, as with the built-in.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 8): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val bigPayload = big.columns.filterNot(_ == key).toSeq
    val smallPayload = small.columns.filterNot(_ == key).toSeq
    val b = big.withColumn("__graft_salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(salts.toLong)))
    val sm = small.withColumn("__graft_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    b.alias("b").join(sm.alias("s"),
        col(s"b.$key") === col(s"s.$key") &&
          col("b.__graft_salt") === col("s.__graft_salt"))
      .select((col(s"b.$key").as(key) +:
        (bigPayload.map(c => col(s"b.$c").as(c)) ++
          smallPayload.map(c => col(s"s.$c").as(c)))): _*)
  }

  /**
   * Changelog compaction (CDC "latest wins"): one row per `keys` — the
   * row whose `orderCols` tuple is lexicographically greatest. The
   * upsert-apply step of every snapshot + changelog ingest
   * (Debezium/Hudi/Delta-style), and the primitive q_snapshot_diff's
   * inputs are built from.
   *
   * NOT a window: `row_number() OVER (PARTITION BY keys ORDER BY ord
   * DESC)` shuffles and SORTS every version of every key. This is a
   * plain aggregate — `max_by(payload_struct, ord_struct)` — so
   * map-side partial aggregation collapses each partition to one
   * struct per key BEFORE the exchange. A key with a million updates
   * ships ≤ one row per input partition instead of a million into one
   * sorting reducer; no skew handling is ever needed.
   *
   * Determinism: `orderCols` must be a total order within each key
   * (include a unique id as the last column) — otherwise ties resolve
   * arbitrarily, exactly as they would in the window formulation.
   *
   * Output: `keys` then the remaining columns, original names/types.
   */
  def compactLatest(df: DataFrame, keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols required")
    val payload = df.columns.filterNot(keys.contains).toSeq
    require(payload.nonEmpty, "no payload columns to compact")
    val ord = struct(orderCols.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), ord).as("__graft_last"))
      .select(keys.map(col) ++
        payload.map(p => col(s"__graft_last.$p").as(p)): _*)
  }

  /**
   * Edit-distance-≤1 string join (FastSS/SymSpell blocking): pairs
   * every left row with every right row whose string is within one
   * insert/delete/substitute of it — spell-correcting noisy keys
   * against a reference vocabulary, merging OCR'd entities, matching
   * near-miss URLs.
   *
   * NOT an all-pairs Levenshtein scan (|L|·|R| distance calls — the
   * plan a naive theta-join produces, quadratic at vocabulary scale).
   * Blocking: two strings are within edit distance 1 **iff** their
   * deletion-variant sets intersect ([[TextFunctions.deletion_variants]]
   * — the string plus each single-character deletion), so candidates
   * come from an EQUI-join on variants — ~(len+1) rows per side,
   * shuffled by variant — and only candidates pay the exact
   * `levenshtein` refine. The classic similarity-join recipe: turn the
   * metric predicate into an equi-key (same design as the minhash band
   * join and [[Temporal.intervalJoin]]'s bucket join).
   *
   * Inputs should be deduplicated relations (e.g. vocabulary tables) —
   * candidate pairs that meet in several variants are `distinct`-ed, so
   * duplicate input rows would collapse.
   *
   * Output: left columns then right columns, one row per matching
   * pair.
   */
  def fuzzyJoin(left: DataFrame, right: DataFrame, leftCol: String,
      rightCol: String): DataFrame = {
    require(left.columns.intersect(right.columns).isEmpty,
      s"column names must not collide across sides: " +
        left.columns.intersect(right.columns).mkString(", "))
    val lv = left.withColumn("__graft_var",
      explode(TextFunctions.deletion_variants(col(leftCol))))
    val rv = right.withColumn("__graft_var",
      explode(TextFunctions.deletion_variants(col(rightCol))))
    val outCols = left.columns.map(c => col(s"l.$c").as(c)) ++
      right.columns.map(c => col(s"r.$c").as(c))
    lv.alias("l").join(rv.alias("r"),
        col("l.__graft_var") === col("r.__graft_var"))
      .select(outCols.toSeq: _*)
      .where(levenshtein(col(leftCol), col(rightCol)) <= 1)
      .distinct()
  }

  /**
   * Bloom-prefiltered inner equi-join: row-identical to
   * `big.join(small, key)`, but the big side is cut down BEFORE the
   * join by a membership probe against a Bloom filter of the small
   * side's keys — the hand-rolled version of a runtime row-level
   * filter (Spark's own `runtime.bloomFilter` optimization plants the
   * same shape; doing it explicitly works on any join the optimizer
   * won't touch, e.g. under a window or through a UDF boundary).
   *
   * Why it matters at 100 TB: a selective dim-side predicate (say 4%
   * of suppliers) normally does nothing for the fact side — every fact
   * row still shuffles into the join. The Bloom probe is a per-row
   * scalar against `numBits/8` bytes built by a one-row aggregate
   * (the shuffle carries bitsets, not rows) and shipped once per task
   * as a plan literal, so ~96% of the fact table dies at the SCAN,
   * before any exchange. False positives just ride through to the
   * exact join, which removes them; false negatives are impossible, so
   * the result is exactly the plain join.
   *
   * The driver materializes the bitset (`numBits/8` bytes; default
   * 2^20 bits = 128 KB) — the same bounded-collect pattern as
   * [[BloomDedup.bloomBits]] and the IVF centroid fit.
   *
   * Output: `key`, big-side payload, small-side payload (the
   * `join ... using` layout, like [[saltedJoin]]).
   */
  def bloomJoin(big: DataFrame, small: DataFrame, key: String,
      numBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val bits = small
      .select(BloomDedup.bloomAgg(xxhash64(col(key)), numBits, k).as("bits"))
      .head().getSeq[Long](0).toArray
    big.where(BloomDedup.bloomContains(lit(bits), xxhash64(col(key)), k))
      .join(small, key)
  }

  /**
   * Blocked edit-distance near-duplicate pairs: all `(id_a, id_b)` with
   * `id_a < id_b` whose texts share a `prefixLen`-char prefix and are
   * within `maxDist` Levenshtein edits — the exact-distance
   * complement to the sketch dedups (minhash/simhash estimate set
   * overlap; Levenshtein certifies character-level edits, the right
   * notion for templated/boilerplate near-dups).
   *
   * NOT all-pairs: candidates come from an equi-self-join on the
   * prefix block key, so the quadratic refine runs per block, and a
   * hot-block guard (same recipe as q_winnow_pairs' hot-fingerprint
   * cut) anti-joins away blocks larger than `hotCap` rows first — a
   * boilerplate prefix shared by a million docs caps at a documented
   * exclusion instead of an O(10^12)-pair reducer. The refine uses the
   * THRESHOLDED `levenshtein(a, b, maxDist)` built-in (banded
   * O(len·maxDist) with early abandon, not full O(len²)).
   *
   * Prefix blocking certifies only dist ≤ maxDist pairs that AGREE on
   * the first `prefixLen` chars (edits inside the prefix land in
   * different blocks) — standard blocked-matching recall trade-off;
   * shingle-based [[Pipeline]] sketches cover prefix-divergent pairs.
   *
   * Output: `id_a`, `id_b`, `dist` (int), one row per pair.
   */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
      prefixLen: Int = 16, maxDist: Int = 10, hotCap: Int = 64): DataFrame = {
    val d = docs.select(col(idCol).as("__graft_id"), col(textCol).as("__graft_txt"),
      substring(col(textCol), 1, prefixLen).as("__graft_blk"))
    val hot = d.groupBy("__graft_blk").agg(count(lit(1)).as("__graft_n"))
      .where(col("__graft_n") > hotCap).select("__graft_blk")
    val cool = d.join(broadcast(hot), Seq("__graft_blk"), "left_anti")
    val a = cool.select(col("__graft_blk"), col("__graft_id").as("id_a"),
      col("__graft_txt").as("__graft_ta"))
    val b = cool.select(col("__graft_blk"), col("__graft_id").as("id_b"),
      col("__graft_txt").as("__graft_tb"))
    a.join(b, Seq("__graft_blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__graft_ta"), col("__graft_tb"), maxDist).cast("int").as("dist"))
      .where(col("dist") >= 0)
  }

  /**
   * Interval-overlap equi-join: pairs every left row with every right
   * row sharing `key` whose CLOSED intervals `[start, end]` overlap —
   * the span×span sibling of [[Temporal.intervalJoin]] (point×span).
   * Validity-window joins (SCD2 dimensions × fact spans), genomic
   * range joins, and concurrent-session overlap all reduce to it.
   *
   * NOT a theta-join: `a.start <= b.end AND b.start <= a.end` alone
   * gives Catalyst no equi-key, so the plan is a per-key nested loop
   * (quadratic in rows-per-key, and a full cartesian if `key` is
   * coarse). Bucketing manufactures the equi-key — each interval
   * explodes to the `bucketWidth`-sized time buckets it touches, the
   * join runs on `(key, bucket)`, and the overlap predicate refines.
   *
   * Exactly-once without a dedup pass: an overlapping pair meets in
   * every shared bucket, but `greatest(a.start, b.start)` lies in BOTH
   * intervals, so its bucket is shared — keeping only that bucket's
   * match emits each pair once (the same allocation trick as
   * intervalJoin's point-owns-one-bucket). No `distinct()` shuffle.
   *
   * Shuffle volume: each row replicates `span/bucketWidth + 1` times —
   * pick `bucketWidth` ≈ the typical span so the factor stays ~2.
   * Long-tail spans cost replication, never correctness.
   *
   * Output: left columns, right columns (names must not collide), one
   * row per overlapping pair.
   */
  def overlapJoin(left: DataFrame, right: DataFrame, key: String,
      leftStart: String, leftEnd: String, rightStart: String,
      rightEnd: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val collisions = left.columns.toSet.intersect(right.columns.toSet) - key
    require(collisions.isEmpty,
      s"column names must not collide across sides: ${collisions.mkString(", ")}")
    val l = left.withColumn("__graft_bkt",
      explode(sequence(expr(s"$leftStart div ${bucketWidth}L"),
        expr(s"$leftEnd div ${bucketWidth}L"))))
    val r = right.withColumnRenamed(key, "__graft_rk")
      .withColumn("__graft_bkt",
        explode(sequence(expr(s"$rightStart div ${bucketWidth}L"),
          expr(s"$rightEnd div ${bucketWidth}L"))))
    val outCols = left.columns.map(col) ++
      right.columns.filterNot(_ == key).map(col)
    l.join(r, col(key) === col("__graft_rk") &&
        l("__graft_bkt") === r("__graft_bkt"))
      .where(col(leftStart) <= col(rightEnd) &&
        col(rightStart) <= col(leftEnd) &&
        l("__graft_bkt") ===
          expr(s"greatest($leftStart, $rightStart) div ${bucketWidth}L"))
      .select(outCols.toSeq: _*)
  }

  /**
   * Scalar band join: pairs every left row with every right row
   * sharing `key` whose integral values differ by at most `eps`
   * (`|leftVal − rightVal| <= eps`, closed) — numeric near-matching:
   * price-collision audits, sensor alignment, feature-value near-dups.
   *
   * Same family as [[overlapJoin]] but for points: bucket width = eps,
   * the LEFT side replicates to its home bucket and both neighbors
   * (bucket boundaries are eps apart, so a matching pair's buckets
   * differ by at most 1), the RIGHT side keeps its single home bucket
   * — every matching pair therefore meets EXACTLY once (the right
   * row's bucket is unique), no dedup shuffle. The equi-join on
   * `(key, bucket)` replaces the per-key nested loop a theta-join
   * plans; constant 3× left-side replication.
   *
   * Values must be integral (scale floats to cents/micros first —
   * exact, and the band semantics stay bit-deterministic).
   *
   * Output: left columns, right columns (names must not collide).
   */
  def bandJoin(left: DataFrame, right: DataFrame, key: String,
      leftVal: String, rightVal: String, eps: Long): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val collisions = left.columns.toSet.intersect(right.columns.toSet) - key
    require(collisions.isEmpty,
      s"column names must not collide across sides: ${collisions.mkString(", ")}")
    val l = left.withColumn("__graft_bkt",
      explode(array(expr(s"$leftVal div ${eps}L - 1"),
        expr(s"$leftVal div ${eps}L"), expr(s"$leftVal div ${eps}L + 1"))))
    val r = right.withColumnRenamed(key, "__graft_rk")
      .withColumn("__graft_bkt", expr(s"$rightVal div ${eps}L"))
    val outCols = left.columns.map(col) ++
      right.columns.filterNot(_ == key).map(col)
    l.join(r, col(key) === col("__graft_rk") &&
        l("__graft_bkt") === r("__graft_bkt"))
      .where(abs(col(leftVal) - col(rightVal)) <= eps)
      .select(outCols.toSeq: _*)
  }

  /**
   * CDC MERGE: apply a changelog (upserts AND deletes) to a snapshot —
   * the Debezium/Hudi/Delta `MERGE INTO` batch primitive.
   * [[compactLatest]] alone gives latest-wins rows; this composes it
   * with the snapshot and honors tombstones: per key, the latest
   * change (by `orderCols`, which must totally order within a key)
   * decides — `opCol == "D"` removes the key, anything else replaces
   * (or inserts) the payload; keys the changelog never touches pass
   * through unchanged.
   *
   * Plan shape at 100 TB: the changelog first collapses to ONE row per
   * touched key via the map-side-combining max_by (a billion updates
   * to one hot key ship ≤ one struct per input partition), then ONE
   * full-outer equi-join against the snapshot — no window over the
   * snapshot, no per-key sort of anything but the compacted heads.
   * Both sides shuffle once on the key; AQE handles skew.
   *
   * `snapshot` and `changes` must share `keys` + payload column names;
   * `changes` additionally carries `opCol` and `orderCols`. Output:
   * the new snapshot, same schema as `snapshot`.
   */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keys: Seq[String], orderCols: Seq[String], opCol: String): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty, "keys and orderCols required")
    val payload = snapshot.columns.filterNot(keys.contains).toSeq
    val missing = (payload :+ opCol).filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes is missing columns: ${missing.mkString(", ")}")
    val latest = compactLatest(
      changes.select(
        (keys ++ payload ++ Seq(opCol) ++ orderCols).distinct.map(col): _*),
      keys, orderCols)
    val snapCols = keys.map(c => col(s"s.$c")) ++ payload.map(c => col(s"s.$c"))
    val out = snapshot.alias("s").join(latest.alias("c"),
        keys.map(k => col(s"s.$k") === col(s"c.$k")).reduce(_ && _),
        "full_outer")
      .where(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "D")
      .select(keys.map(k => coalesce(col(s"c.$k"), col(s"s.$k")).as(k)) ++
        payload.map(p =>
          when(col(s"c.$opCol").isNotNull, col(s"c.$p"))
            .otherwise(col(s"s.$p")).as(p)): _*)
    out
  }

  /**
   * Longest-prefix-match join — the IP-to-CIDR lookup (GeoIP
   * enrichment, blocklist filtering, routing-table audit). For each
   * left row, the rule with the longest prefix length whose prefix
   * bits equal the top bits of `ipCol` (a 32-bit address as long).
   *
   * Mechanics: the distinct prefix lengths present in `rules` are a
   * bounded driver collect (≤ 33 values); each left row expands to one
   * candidate per length (`ip >> (32 − len)`), meets its rules via an
   * EQUI-join on `(len, prefix)`, and the longest match wins per row
   * through one `max_by`-shaped struct max — never a `left LIKE
   * rule%`/theta join, which plans a nested loop over the full rule
   * table. Expansion factor = distinct lengths (real routing tables:
   * ~20), so a 100 TB fact side stays a linear-cost equi-join; a
   * GeoIP-sized rule side (millions of rows) shuffles or AQE-
   * broadcasts like any dimension table.
   *
   * `rules` must be unique on `(lenCol, prefixCol)` — pre-aggregate
   * multi-action tables first. Output: all left columns, then
   * `matched_len` + the rule payload columns (null when nothing
   * matches, left-outer semantics).
   */
  def longestPrefixJoin(left: DataFrame, ipCol: String, idCol: String,
      rules: DataFrame, lenCol: String, prefixCol: String): DataFrame = {
    val lengths = rules.select(col(lenCol).cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted // bounded: ≤ 33 prefix lengths
    require(lengths.nonEmpty && lengths.forall(l => l >= 1 && l <= 32),
      s"prefix lengths must be in [1,32], got ${lengths.mkString(",")}")
    val payload = rules.columns.filterNot(c => c == lenCol || c == prefixCol).toSeq
    val r = rules.select(
      (col(lenCol).cast("int").as("__graft_len") +:
        col(prefixCol).cast("long").as("__graft_p") +:
        payload.map(col)): _*)
    val cand = left
      .withColumn("__graft_len", explode(lit(lengths)))
      .withColumn("__graft_p", expr(s"shiftright($ipCol, 32 - __graft_len)"))
      .join(r, Seq("__graft_len", "__graft_p"))
    // longest match per left row: struct max is lexicographic, led by len
    val winner = cand.groupBy(col(idCol))
      .agg(max(struct(col("__graft_len").as("len") +:
        payload.map(col): _*)).as("__graft_w"))
      .select(col(idCol).as("__graft_id"), col("__graft_w"))
    left.join(winner, col(idCol) === col("__graft_id"), "left")
      .select(left.columns.map(col) ++
        (col("__graft_w.len").as("matched_len") +:
          payload.map(p => col(s"__graft_w.$p").as(p))): _*)
  }

  /**
   * Longest path-prefix match — [[longestPrefixJoin]]'s string
   * sibling for URL paths (robots-style blocklists, routing tables,
   * per-section crawl policies). A rule `/a/b` matches any path whose
   * first segments are exactly `a, b`; the deepest matching rule wins
   * per row.
   *
   * Same shape: the distinct rule DEPTHS (segment counts) are a
   * bounded driver collect; each left row expands to one
   * segment-prefix string per depth and meets its rules in an
   * EQUI-join on the prefix — never `path LIKE rule || '%'`, which
   * both plans a nested loop AND is wrong at segment boundaries
   * (`/ab` is not under `/a`). `rules` must be unique on `prefixCol`;
   * prefixes are `/seg/seg…` with no trailing slash. Output: left
   * columns + `matched_depth` + rule payload (nulls when unmatched).
   */
  def pathPrefixJoin(left: DataFrame, pathCol: String, idCol: String,
      rules: DataFrame, prefixCol: String): DataFrame = {
    val depths = rules
      .select((size(split(col(prefixCol), "/")) - 1).cast("int").as("__d"))
      .distinct().collect().map(_.getInt(0)).sorted // bounded: rule depths
    require(depths.nonEmpty && depths.forall(d => d >= 1 && d <= 32),
      s"rule depths must be in [1,32] segments, got ${depths.mkString(",")}")
    val payload = rules.columns.filterNot(_ == prefixCol).toSeq
    val r = rules.select(
      (col(prefixCol).as("__graft_p") +:
        (size(split(col(prefixCol), "/")) - 1).cast("int").as("__graft_d") +:
        payload.map(col)): _*)
    val cand = left
      .withColumn("__graft_d", explode(lit(depths)))
      // split('/a/b','/') = ["","a","b"]; slice(1, d+1) + join = "/a/…"
      .withColumn("__graft_p",
        array_join(slice(split(col(pathCol), "/"), lit(1), col("__graft_d") + 1), "/"))
      .join(r, Seq("__graft_p", "__graft_d"))
    val winner = cand.groupBy(col(idCol))
      .agg(max(struct(col("__graft_d").as("d") +:
        payload.map(col): _*)).as("__graft_w"))
      .select(col(idCol).as("__graft_id"), col("__graft_w"))
    left.join(winner, col(idCol) === col("__graft_id"), "left")
      .select(left.columns.map(col) ++
        (col("__graft_w.d").as("matched_depth") +:
          payload.map(p => col(s"__graft_w.$p").as(p))): _*)
  }

  /**
   * Parent/child conservation audit — the reconciliation report every
   * ingestion pipeline runs between a header table and its detail rows
   * (order total vs line-item sum, session duration vs event span,
   * declared byte count vs shard sizes): per parent key, the declared
   * value, the children's sum and count, and the signed `diff`.
   * Integral values only (pre-scale money to cents) so the audit is
   * exact — a float sum would itself need reconciling.
   *
   * Scale shape: the child side reduces FIRST (one map-side-combinable
   * groupBy to parent-key cardinality), then one left equi-join against
   * the parent table — the detail rows never join directly. Parents
   * with no children report `child_sum = 0, n_children = 0` (left
   * outer), so orphan headers surface instead of vanishing.
   */
  def conservationAudit(parent: DataFrame, parentKey: String,
      parentVal: String, child: DataFrame, childKey: String,
      childVal: String): DataFrame = {
    val sums = child.groupBy(col(childKey).as(parentKey))
      .agg(sum(col(childVal).cast("long")).as("child_sum"),
        count(lit(1)).as("n_children"))
    parent.select(col(parentKey), col(parentVal).cast("long").as("parent_val"))
      .join(sums, Seq(parentKey), "left")
      .na.fill(0L, Seq("child_sum", "n_children"))
      .withColumn("diff", col("parent_val") - col("child_sum"))
  }
}
