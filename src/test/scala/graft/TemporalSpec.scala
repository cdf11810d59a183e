package graft

import graft.pipeline.Temporal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def quotes = Seq(
    // key, ts, px
    ("A", 100L, 1.0), ("A", 200L, 2.0), ("A", 300L, 3.0),
    ("B", 150L, 9.0)).toDF("k", "ts", "px")

  private def trades = Seq(
    ("A", 99L, 10), ("A", 100L, 11), ("A", 250L, 12), ("A", 301L, 13),
    ("B", 140L, 14), ("C", 500L, 15)).toDF("k", "ts", "qty")

  test("asofJoin: backward match with exact-match inclusion, left outer") {
    val out = Temporal.asofJoin(trades, quotes, "k", "ts", "ts")
      .orderBy("k", "ts").collect()
    // (trade ts -> matched quote ts, px)
    val got = out.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(3)) null else r.getLong(3),
      if (r.isNullAt(4)) null else r.getDouble(4))).toSeq
    assert(got == Seq(
      ("A", 99L, null, null),        // before first quote
      ("A", 100L, 100L, 1.0),        // exact ts matches
      ("A", 250L, 200L, 2.0),        // latest at-or-before
      ("A", 301L, 300L, 3.0),
      ("B", 140L, null, null),
      ("C", 500L, null, null)))      // key absent from right
  }

  test("asofJoin: tolerance nulls out stale matches") {
    val out = Temporal.asofJoin(trades, quotes, "k", "ts", "ts",
        tolerance = Some(lit(10L)))
      .orderBy("k", "ts").collect()
    val matched = out.map(r => (r.getString(0), r.getLong(1), !r.isNullAt(3))).toSeq
    assert(matched == Seq(
      ("A", 99L, false), ("A", 100L, true), ("A", 250L, false),
      ("A", 301L, true), ("B", 140L, false), ("C", 500L, false)))
  }

  test("asofJoin: ties on (key, ts) resolve to the greatest payload") {
    val r = Seq(("A", 10L, 1.0), ("A", 10L, 5.0), ("A", 10L, 3.0)).toDF("k", "ts", "v")
    val l = Seq(("A", 10L), ("A", 11L)).toDF("k", "ts")
    val out = Temporal.asofJoin(l, r, "k", "ts", "ts").orderBy("ts").collect()
    assert(out.map(_.getDouble(3)).toSeq == Seq(5.0, 5.0))
  }

  test("asofJoin matches a brute-force oracle on random data") {
    val n = 500
    val rnd = new scala.util.Random(7)
    val lt = (1 to n).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i))
    val rt = (1 to n).map(i => (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, i.toDouble))
    // brute: for each left row the max right ts <= l.ts; payload max on tie
    val expected = lt.map { case (k, ts, i) =>
      val cand = rt.filter(r => r._1 == k && r._2 <= ts)
      val m = if (cand.isEmpty) None
        else { val mt = cand.map(_._2).max; Some(cand.filter(_._2 == mt).map(_._3).max) }
      (k, ts, i, m)
    }.sortBy(t => (t._1, t._2, t._3))
    val out = Temporal.asofJoin(lt.toDF("k", "ts", "i"), rt.toDF("k", "ts", "v"),
        "k", "ts", "ts")
      .orderBy("k", "ts", "i").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(out == expected)
  }

  test("intervalJoin: half-open containment, exact pairs, any bucket width") {
    val pts = Seq(("A", 5L, "p1"), ("A", 10L, "p2"), ("A", 19L, "p3"),
      ("A", 20L, "p4"), ("B", 10L, "p5")).toDF("k", "ts", "tag")
    val spans = Seq(("A", 10L, 20L, "s1"), ("A", 15L, 16L, "s2"),
      ("A", 30L, 30L, "s0"), // empty: end == start
      ("B", 0L, 100L, "s3")).toDF("k", "lo", "hi", "name")
    val expected = Set(("p2", "s1"), ("p3", "s1"), ("p5", "s3"))
    for (width <- Seq(1L, 3L, 7L, 64L, 1000L)) {
      val got = Temporal.intervalJoin(pts, spans, "k", "ts", "lo", "hi", width)
        .select("tag", "span_name").collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == expected, s"width $width")
    }
  }

  test("intervalJoin matches a brute-force oracle on random spans") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(i => (s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong, i))
    val spans = (1 to 80).map { i =>
      val lo = rnd.nextInt(500).toLong
      (s"k${rnd.nextInt(5)}", lo, lo + rnd.nextInt(60), i)
    }
    val expected = (for {
      (pk, ts, pi) <- pts
      (sk, lo, hi, si) <- spans
      if pk == sk && ts >= lo && ts < hi
    } yield (pi, si)).toSet
    val got = Temporal.intervalJoin(pts.toDF("k", "ts", "i"),
        spans.toDF("k", "lo", "hi", "j"), "k", "ts", "lo", "hi", 32L)
      .select("i", "span_j").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == expected)
  }

  test("asofJoinBucketed equals asofJoin on a skewed key, for any bucket width") {
    // one hot key with 400 left + 200 right rows, one cold key, one
    // key absent from the right — plus planted boundary collisions
    // (ts exactly at multiples of every tested width)
    val rnd = new scala.util.Random(11)
    val lt = (1 to 400).map(i => ("hot", rnd.nextInt(1000).toLong, i)) ++
      (1 to 20).map(i => ("cold", rnd.nextInt(1000).toLong, 1000 + i)) ++
      Seq(("hot", 0L, 9001), ("hot", 100L, 9002), ("hot", 700L, 9003),
        ("none", 50L, 9004))
    val rt = (1 to 200).map(i => ("hot", rnd.nextInt(1000).toLong, i.toDouble)) ++
      Seq(("hot", 100L, 777.0), ("cold", 500L, 1.5))
    val l = lt.toDF("k", "ts", "qty")
    val r = rt.toDF("k", "ts", "px")
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map { row =>
      (row.getString(0), row.getLong(1), row.getInt(2),
        if (row.isNullAt(3)) null else row.getLong(3),
        if (row.isNullAt(4)) null else row.getDouble(4))
    }.toSet
    val plain = key(Temporal.asofJoin(l, r, "k", "ts", "ts").collect())
    for (width <- Seq(1L, 7L, 100L, 1000000L)) {
      val bucketed = key(
        Temporal.asofJoinBucketed(l, r, "k", "ts", "ts", bucketWidth = width).collect())
      assert(bucketed == plain, s"width $width diverged")
    }
    // tolerance path too
    val plainTol = key(Temporal.asofJoin(l, r, "k", "ts", "ts",
      tolerance = Some(lit(50L))).collect())
    val bucketedTol = key(Temporal.asofJoinBucketed(l, r, "k", "ts", "ts",
      bucketWidth = 100L, tolerance = Some(lit(50L))).collect())
    assert(bucketedTol == plainTol)
  }

  test("asofJoin direction=forward matches the earliest at-or-after row") {
    val out = Temporal.asofJoin(trades, quotes, "k", "ts", "ts",
        direction = "forward")
      .orderBy("k", "ts").collect()
    val got = out.map(r => (r.getString(0), r.getLong(1),
      if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(got == Seq(
      ("A", 99L, 100L),   // next quote after 99
      ("A", 100L, 100L),  // exact ts matches forward too
      ("A", 250L, 300L),
      ("A", 301L, null),  // nothing after the last quote
      ("B", 140L, 150L),
      ("C", 500L, null)))
    // forward tolerance: gap = rightTs - leftTs
    val tol = Temporal.asofJoin(trades, quotes, "k", "ts", "ts",
        tolerance = Some(lit(10L)), direction = "forward")
      .orderBy("k", "ts").collect()
      .map(r => !r.isNullAt(3)).toSeq
    assert(tol == Seq(true, true, false, false, true, false))
  }

  test("asofJoin forward matches a brute-force oracle on random data") {
    val n = 500
    val rnd = new scala.util.Random(13)
    val lt = (1 to n).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i))
    val rt = (1 to n).map(i => (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, i.toDouble))
    val expected = lt.map { case (k, ts, i) =>
      val cand = rt.filter(r => r._1 == k && r._2 >= ts)
      val m = if (cand.isEmpty) None
        else { val mt = cand.map(_._2).min; Some(cand.filter(_._2 == mt).map(_._3).max) }
      (k, ts, i, m)
    }.sortBy(t => (t._1, t._2, t._3))
    val out = Temporal.asofJoin(lt.toDF("k", "ts", "i"), rt.toDF("k", "ts", "v"),
        "k", "ts", "ts", direction = "forward")
      .orderBy("k", "ts", "i").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(out == expected)
  }

  test("asofJoin direction=nearest picks the smaller gap, ties backward") {
    val out = Temporal.asofJoin(trades, quotes, "k", "ts", "ts",
        direction = "nearest")
      .orderBy("k", "ts").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    assert(out == Seq(
      ("A", 99L, 100L),   // only forward exists
      ("A", 100L, 100L),  // exact
      ("A", 250L, 200L),  // back gap 50 <= fwd gap 50: tie -> backward
      ("A", 301L, 300L),  // only backward
      ("B", 140L, 150L),
      ("C", 500L, null)))
  }

  test("asofJoin nearest matches a brute-force oracle on random data") {
    val n = 400
    val rnd = new scala.util.Random(17)
    val lt = (1 to n).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i))
    val rt = (1 to n).map(i => (s"k${rnd.nextInt(6)}", rnd.nextInt(1000).toLong, i.toDouble))
    val expected = lt.map { case (k, ts, i) =>
      val back = rt.filter(r => r._1 == k && r._2 <= ts)
      val fwd = rt.filter(r => r._1 == k && r._2 >= ts)
      val b = if (back.isEmpty) None else {
        val mt = back.map(_._2).max; Some((mt, back.filter(_._2 == mt).map(_._3).max)) }
      val f = if (fwd.isEmpty) None else {
        val mt = fwd.map(_._2).min; Some((mt, fwd.filter(_._2 == mt).map(_._3).max)) }
      val m = (b, f) match {
        case (None, x) => x.map(_._2)
        case (x, None) => x.map(_._2)
        case (Some((bt, bv)), Some((ft, fv))) =>
          if (ts - bt <= ft - ts) Some(bv) else Some(fv)
      }
      (k, ts, i, m)
    }.sortBy(t => (t._1, t._2, t._3))
    val out = Temporal.asofJoin(lt.toDF("k", "ts", "i"), rt.toDF("k", "ts", "v"),
        "k", "ts", "ts", direction = "nearest")
      .orderBy("k", "ts", "i").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(out == expected)
  }

  test("asofJoin allowExactMatches=false excludes equal-ts rights") {
    def got(dir: String) = Temporal.asofJoin(trades, quotes, "k", "ts", "ts",
        direction = dir, allowExactMatches = false)
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(1), if (r.isNullAt(3)) null else r.getLong(3))).toSeq
    // backward: the exact-ts quote at 100 no longer matches trade@100
    assert(got("backward") == Seq(
      (99L, null), (100L, null), (250L, 200L), (301L, 300L),
      (140L, null), (500L, null)))
    // forward: trade@100 now skips quote@100 to quote@200
    assert(got("forward") == Seq(
      (99L, 100L), (100L, 200L), (250L, 300L), (301L, null),
      (140L, 150L), (500L, null)))
  }

  test("asofJoin accepts TIMESTAMP columns directly (no pre-cast)") {
    // same data as the numeric fixtures, lifted to typed TIMESTAMP via
    // timestamp_micros — results must agree row-for-row with the
    // numeric run (the round-9 regression class: a caller handing the
    // operator a typed parquet column must just work)
    val tq = quotes.withColumn("ts", timestamp_micros(col("ts")))
    val tt = trades.withColumn("ts", timestamp_micros(col("ts")))
    val out = Temporal.asofJoin(tt, tq, "k", "ts", "ts")
      .select(col("k"), unix_micros(col("ts")).as("ts"), col("qty"),
        unix_micros(col("right_ts")).as("right_ts"), col("right_px"))
      .orderBy("k", "ts").collect()
    val num = Temporal.asofJoin(trades, quotes, "k", "ts", "ts")
      .orderBy("k", "ts").collect()
    assert(out.map(_.toSeq).toSeq == num.map(_.toSeq).toSeq)
    // tolerance is in MICROS for TIMESTAMP inputs
    val tol = Temporal.asofJoin(tt, tq, "k", "ts", "ts",
        tolerance = Some(lit(10L)))
      .orderBy("k", "ts").collect()
      .map(r => !r.isNullAt(3)).toSeq
    assert(tol == Seq(false, true, false, true, false, false))
  }

  test("asofJoinBucketed and intervalJoin accept TIMESTAMP columns") {
    val tq = quotes.withColumn("ts", timestamp_micros(col("ts")))
    val tt = trades.withColumn("ts", timestamp_micros(col("ts")))
    val b = Temporal.asofJoinBucketed(tt, tq, "k", "ts", "ts", bucketWidth = 100L)
      .select(col("k"), unix_micros(col("ts")).as("ts"), col("qty"),
        unix_micros(col("right_ts")).as("right_ts"), col("right_px"))
      .orderBy("k", "ts").collect()
    val num = Temporal.asofJoin(trades, quotes, "k", "ts", "ts")
      .orderBy("k", "ts").collect()
    assert(b.map(_.toSeq).toSeq == num.map(_.toSeq).toSeq)

    // interval join: typed points against NUMERIC spans — the refine
    // runs in the normalized micros domain so mixing is legal
    val pts = Seq(("A", 5L, "p1"), ("A", 10L, "p2"), ("A", 19L, "p3"),
      ("A", 20L, "p4"), ("B", 10L, "p5")).toDF("k", "ts", "tag")
      .withColumn("ts", timestamp_micros(col("ts")))
    val spans = Seq(("A", 10L, 20L, "s1"), ("A", 15L, 16L, "s2"),
      ("B", 0L, 100L, "s3")).toDF("k", "lo", "hi", "name")
    val got = Temporal.intervalJoin(pts, spans, "k", "ts", "lo", "hi", 7L)
      .select("tag", "span_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("p2", "s1"), ("p3", "s1"), ("p5", "s3")))
  }

  test("resample: OHLC bars per (key, bucket)") {
    val df = Seq(
      ("A", 101L, 5L), ("A", 105L, 2L), ("A", 109L, 8L), // bucket 10
      ("A", 113L, 1L),                                   // bucket 11
      ("B", 101L, 7L)).toDF("k", "ts", "v")
    val got = Temporal.resample(df, "k", "ts", "v", bucketWidth = 10L)
      .orderBy("k", "bucket_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    // (k, bucket_start, open, high, low, close, n, total)
    assert(got == Seq(
      ("A", 100L, 5L, 8L, 2L, 8L, 3L, 15L),
      ("A", 110L, 1L, 1L, 1L, 1L, 1L, 1L),
      ("B", 100L, 7L, 7L, 7L, 7L, 1L, 7L)))
  }

  test("resample: equal-ts ties take smallest value as open, greatest as close") {
    val df = Seq(("A", 100L, 9L), ("A", 100L, 3L)).toDF("k", "ts", "v")
    val r = Temporal.resample(df, "k", "ts", "v", 10L).collect()(0)
    assert((r.getLong(2), r.getLong(5)) == (3L, 9L)) // open, close
  }

  test("rolling: trailing inclusive range frame") {
    val df = Seq(("A", 100L, 1L), ("A", 105L, 2L), ("A", 110L, 4L),
      ("A", 121L, 8L), ("B", 100L, 16L)).toDF("k", "ts", "v")
    val got = Temporal.rolling(df, "k", "ts", "v", window = 10L)
      .orderBy("k", "ts")
      .select("k", "ts", "roll_n", "roll_sum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("A", 100L, 1L, 1L),   // [90,100]: itself
      ("A", 105L, 2L, 3L),   // [95,105]: 100,105
      ("A", 110L, 3L, 7L),   // [100,110]: all three (inclusive lower end)
      ("A", 121L, 1L, 8L),   // [111,121]: itself only
      ("B", 100L, 1L, 16L)))
  }

  test("rollingBucketed matches rolling for any bucketWidth >= window") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 800).map(_ =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong, rnd.nextInt(100).toLong))
    val df = rows.toDF("k", "ts", "v")
    val plainRows = Temporal.rolling(df, "k", "ts", "v", window = 37L)
      .orderBy("k", "ts", "v").collect().map(_.toSeq).toSeq
    for (width <- Seq(37L, 38L, 50L, 100L, 1000L)) {
      val buck = Temporal.rollingBucketed(df, "k", "ts", "v",
          window = 37L, bucketWidth = width)
        .orderBy("k", "ts", "v").collect().map(_.toSeq).toSeq
      assert(buck == plainRows, s"width=$width diverged")
    }
  }

  test("rollingBucketed rejects bucketWidth < window") {
    val df = Seq(("A", 1L, 1L)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException](
      Temporal.rollingBucketed(df, "k", "ts", "v", window = 10L, bucketWidth = 5L))
  }

  test("funnel: step times chain, equal timestamps progress, keys without step 1 stall") {
    val ev = Seq(
      // u1 completes all three, step2 at the SAME ts as step1
      (1L, 10L, "a"), (1L, 10L, "b"), (1L, 30L, "c"),
      // u2: b before any a never counts; the later b does
      (2L, 5L, "b"), (2L, 10L, "a"), (2L, 20L, "b"),
      // u3: no a at all
      (3L, 1L, "b"), (3L, 2L, "c")).toDF("u", "ts", "e")
    val got = Temporal.funnel(ev, "u", "ts", "e", Seq("a", "b", "c"))
      .orderBy("u").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getInt(4))).toSeq
    assert(got == Seq(
      (1L, 10L, 10L, 30L, 3),
      (2L, 10L, 20L, -1L, 2),
      (3L, -1L, -1L, -1L, 0)))
  }

  test("funnel: within bounds later steps relative to the FIRST step") {
    val ev = Seq(
      (1L, 0L, "a"), (1L, 40L, "b"), (1L, 60L, "c"),
      (2L, 0L, "a"), (2L, 40L, "b"), (2L, 90L, "c")).toDF("u", "ts", "e")
    val got = Temporal.funnel(ev, "u", "ts", "e", Seq("a", "b", "c"),
        within = Some(80L))
      .orderBy("u").collect().map(r => r.getInt(4)).toSeq
    assert(got == Seq(3, 2)) // u2's c at 90 > 0 + 80 stalls
  }

  test("funnel matches a brute-force oracle on random data") {
    val rnd = new scala.util.Random(23)
    val steps = Seq("s1", "s2", "s3")
    val rows = (1 to 1500).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextInt(200).toLong, s"s${1 + rnd.nextInt(4)}")) // s4 = noise
    val expected = rows.groupBy(_._1).map { case (u, evs) =>
      var prev = Option(Long.MinValue)
      val ts = steps.map { s =>
        val t = prev.flatMap(p =>
          evs.filter(e => e._3 == s && e._2 >= p).map(_._2).minOption)
        prev = t
        t
      }
      (u, ts.map(_.getOrElse(-1L)), ts.count(_.isDefined))
    }.toSeq.sortBy(_._1)
    val got = Temporal.funnel(rows.toDF("u", "ts", "e"), "u", "ts", "e", steps)
      .orderBy("u").collect()
      .map(r => (r.getLong(0),
        (1 to 3).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)).toList,
        r.getInt(4))).toSeq
    assert(got == expected)
  }

  test("funnel and rolling plans are a single shuffle") {
    val df = Seq(("A", 1L, 1L)).toDF("k", "ts", "v")
    for (plan <- Seq(
        Temporal.funnel(df.toDF("k", "ts", "e").withColumn("e", lit("a")),
          "k", "ts", "e", Seq("a", "b", "c"))
          .queryExecution.executedPlan.toString,
        Temporal.rolling(df, "k", "ts", "v", 10L)
          .queryExecution.executedPlan.toString)) {
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
    }
  }

  test("asofJoin plan is a single shuffle (no broadcast-nested-loop)") {
    val plan = Temporal.asofJoin(trades, quotes, "k", "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // exactly one exchange hashes the key for the window
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("scd2: versions chain per key, last version stays open") {
    val log = Seq(("A", 10L, "v1", 1L), ("A", 20L, "v2", 2L),
      ("A", 30L, "v3", 3L), ("B", 15L, "w1", 4L)).toDF("k", "ts", "pay", "id")
    val got = Temporal.scd2(log, Seq("k"), "ts", Seq("id"))
      .orderBy("k", "valid_from_us")
      .select("k", "pay", "valid_from_us", "valid_to_us")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq(("A", "v1", 10L, 20L), ("A", "v2", 20L, 30L),
      ("A", "v3", 30L, -1L), ("B", "w1", 15L, -1L)))
  }

  test("scd2: equal-ts versions tie-break on tieCols deterministically") {
    val log = Seq(("A", 10L, "first", 1L), ("A", 10L, "second", 2L))
      .toDF("k", "ts", "pay", "id")
    val got = Temporal.scd2(log, Seq("k"), "ts", Seq("id"))
      .orderBy("valid_from_us", "pay")
      .select("pay", "valid_to_us")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got == Seq(("first", 10L), ("second", -1L)))
  }

  test("gapFill completes the spine and forward-fills from the prior value") {
    val sparse = Seq(("A", 10L, 1L), ("A", 13L, 2L), ("B", 5L, 9L))
      .toDF("k", "b", "v")
    val got = Temporal.gapFill(sparse, "k", "b", "v")
      .orderBy("k", "b")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("A", 10L, 1L, 1L), ("A", 11L, -1L, 1L), ("A", 12L, -1L, 1L),
      ("A", 13L, 2L, 2L), ("B", 5L, 9L, 9L)))
  }

  test("intervalUnionLength merges overlaps exactly (hand case + brute)") {
    val sp = Seq(("A", 0L, 10L), ("A", 5L, 15L), ("A", 20L, 25L),
      ("A", 6L, 8L), ("B", 3L, 3L)).toDF("k", "s", "e")
    val got = Temporal.intervalUnionLength(sp, "k", "s", "e")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // A: [0,15) ∪ [20,25) = 20 covered; raw sum 10+10+5+2 = 27
    assert(got("A") == (4L, 27L, 20L))
    assert(got("B") == (1L, 0L, 0L), "zero-length span covers nothing")

    val rnd = new scala.util.Random(31)
    val spans = (1 to 500).map { _ =>
      val s = rnd.nextInt(300).toLong
      (rnd.nextInt(3).toLong, s, s + rnd.nextInt(40).toLong)
    }
    val brute = spans.groupBy(_._1).map { case (k, ss) =>
      k -> ss.flatMap(t => t._2 until t._3).toSet.size.toLong
    }
    val out = Temporal.intervalUnionLength(
        spans.toDF("k", "s", "e"), "k", "s", "e")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == brute)
  }

  test("scd2 accepts TIMESTAMP columns and is one shuffle") {
    val log = Seq(("A", "2024-01-01 00:00:00", 1L), ("A", "2024-01-02 00:00:00", 2L))
      .toDF("k", "s", "id").withColumn("ts", col("s").cast("timestamp"))
    val out = Temporal.scd2(log, Seq("k"), "ts", Seq("id"))
    val rows = out.orderBy("id").select("valid_from_us", "valid_to_us")
      .collect()
    assert(rows(0).getLong(0) == 1704067200000000L)
    assert(rows(0).getLong(1) == 1704153600000000L && rows(1).isNullAt(1))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("attribution: first/last touch inside lookback, ties by id, left outer") {
    val ev = Seq(
      // user 1: touches at 10 (view), 20 (click), conversion at 25;
      // an old touch at -100 (outside 30-tick lookback from 25? no —
      // 25-30=-5, so -100 is outside), an error event never attributes
      (1L, 1L, -100L, "view"), (2L, 1L, 10L, "view"), (3L, 1L, 20L, "click"),
      (4L, 1L, 22L, "error"), (5L, 1L, 25L, "purchase"),
      // user 2: conversion with no touches in window
      (6L, 2L, 1000L, "purchase"),
      // user 3: two touches at the SAME ts — tie breaks to smaller id;
      // a touch exactly at conversion ts is excluded (frame ends at -1)
      (7L, 3L, 50L, "view"), (8L, 3L, 50L, "click"), (9L, 3L, 60L, "view"),
      (10L, 3L, 60L, "purchase")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Temporal.attribution(ev, "user_id", "event_id", "ts",
      "event_type", "purchase", Seq("click", "view"), lookbackMicros = 30L)
      .orderBy("conversion_id").collect()
    assert(out.length == 3)
    val r1 = out(0) // conversion 5: first=2 (ts 10), last=3 (ts 20)
    assert(r1.getLong(3) == 2L && r1.getString(4) == "view" && r1.getLong(5) == 10L)
    assert(r1.getLong(6) == 3L && r1.getString(7) == "click" && r1.getLong(8) == 20L)
    val r2 = out(1) // conversion 6: no touches -> nulls
    assert(r2.isNullAt(3) && r2.isNullAt(6))
    val r3 = out(2) // conversion 10: first=(50,7), last=(50,8); ts-60 view excluded
    assert(r3.getLong(3) == 7L && r3.getLong(6) == 8L)
  }

  test("clampedCumSum equals the direct max(floor,.) recurrence") {
    val rnd = new scala.util.Random(13)
    val rows = for (k <- 0 until 3; t <- 0 until 50)
      yield (k.toLong, t.toLong, (rnd.nextInt(21) - 10).toLong)
    val df = rows.toDF("k", "t", "d")
    for (floor <- Seq(0L, 5L)) {
      val got = Temporal.clampedCumSum(df, Seq("k"), Seq("t"), "d", floor)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      for (k <- 0 until 3) {
        var bal = floor
        for (t <- 0 until 50) {
          bal = math.max(floor, bal + rows(k * 50 + t)._3)
          assert(got((k.toLong, t.toLong)) == bal, s"floor=$floor k=$k t=$t")
        }
      }
    }
  }

  test("attribution plan is one shuffle, no join") {
    val ev = Seq((1L, 1L, 10L, "view"), (2L, 1L, 25L, "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Temporal.attribution(ev, "user_id", "event_id", "ts",
      "event_type", "purchase", Seq("click", "view"), 30L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 hash exchange, plan:\n$plan")
  }

  test("growthCurve: first-seen counts and distinct-to-date cume") {
    import spark.implicits._
    // user 1 on days 1,3; user 2 on day 1; user 3 on day 3 (all key a);
    // user 1 again under key b on day 2
    val df = Seq(("a", 1L, 1L), ("a", 1L, 3L), ("a", 2L, 1L),
      ("a", 3L, 3L), ("b", 1L, 2L)).toDF("k", "uid", "day")
    val out = graft.pipeline.Temporal.growthCurve(df, Seq("k"), "uid", "day")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(("a", 1L) -> ((2L, 2L)), ("a", 3L) -> ((1L, 3L)),
      ("b", 2L) -> ((1L, 1L))))
    // keyless: one global curve
    val g = graft.pipeline.Temporal.growthCurve(df, Seq.empty, "uid", "day")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g == Map(1L -> ((2L, 2L)), 3L -> ((1L, 3L))))
  }

  test("m4Downsample: first/last/min/max per bucket, struct tie-break") {
    import spark.implicits._
    val df = Seq(("a", 0L, 5L), ("a", 40L, 1L), ("a", 90L, 9L), ("a", 99L, 2L),
      ("a", 150L, 7L), ("b", 10L, 3L)).toDF("k", "ts", "v")
    val out = graft.pipeline.Temporal.m4Downsample(df, Seq("k"), "ts", "v", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    // bucket a/0: n=4, min=1, max=9, first=(0,5), last=(99,2)
    assert(out(("a", 0L)) == ((4L, 1L, 9L, 0L, 5L, 99L, 2L)))
    assert(out(("a", 1L)) == ((1L, 7L, 7L, 150L, 7L, 150L, 7L)))
    assert(out(("b", 0L)) == ((1L, 3L, 3L, 10L, 3L, 10L, 3L)))
  }

  test("debounce: LAG semantics, tie-break by id, per-key independence") {
    import spark.implicits._
    // key u: 0s, 30s, 100s, 100s (dup ts) with 60s gap
    val df = Seq((1L, "u", 0L), (2L, "u", 30L), (3L, "u", 100L),
      (4L, "u", 100L), (5L, "v", 1L)).toDF("id", "k", "ts")
    val out = graft.pipeline.Temporal.debounce(df, Seq("k"), "ts", "id", 60L)
      .collect().map(r => r.getLong(0) -> (r.isNullAt(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((true, true)))    // first of key: NULL gap, kept
    assert(out(2L) == ((false, false)))  // 30 < 60: dropped
    assert(out(3L) == ((false, true)))   // 70 >= 60: kept (LAG, not chained)
    assert(out(4L) == ((false, false)))  // tie: larger id sees gap 0
    assert(out(5L) == ((true, true)))    // other key unaffected
    // exact-duplicate timestamps: smallest id survives regardless of order
    val dup = Seq((9L, "w", 5L), (7L, "w", 5L), (8L, "w", 5L)).toDF("id", "k", "ts")
    val kept = graft.pipeline.Temporal.debounce(dup, Seq("k"), "ts", "id", 10L)
      .where(col("is_kept")).collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(7L))
  }

  test("autocorr: hand-computed lag-1 ACF, constant NULL, short-series NULL") {
    def acf(rows: Seq[(String, Long, Long, Long)], k: Int) =
      Temporal.autocorr(rows.toDF("key", "ts", "id", "v"),
          "key", "ts", "id", "v", k)
        .collect().map(r => r.getString(0) -> r).toMap
    // x = [1,2,3,4], lag 1: classic ACF = 1.25/5 = 0.25 -> 250 permille
    // cleared: num = 16*20 - 4*10*15 + 3*100 = 20, den = 16*30 - 400 = 80
    val a = acf((1L to 4L).map(i => ("a", i * 10L, i, i)), 1)("a")
    assert(a.getLong(1) == 4L)
    assert(a.getLong(2) == 20L && a.getLong(3) == 80L)
    assert(a.getLong(4) == 250L)
    // alternating series, lag 2 = perfectly in phase -> positive; lag 1
    // anti-phase -> negative permille (sign-handled truncating div)
    val alt = (1L to 8L).map(i => ("b", i * 10L, i, if (i % 2 == 0) 10L else -10L))
    assert(acf(alt, 1)("b").getLong(4) < 0L)
    assert(acf(alt, 2)("b").getLong(4) > 0L)
    // constant series: den = 0 -> NULL
    assert(acf((1L to 5L).map(i => ("c", i * 10L, i, 7L)), 1)("c").isNullAt(4))
    // series shorter than k+1 -> no overlapping terms -> NULL
    assert(acf(Seq(("d", 10L, 1L, 1L), ("d", 20L, 2L, 2L)), 3)("d").isNullAt(4))
  }

  test("journeys: trigram paths respect session breaks and minCount") {
    def ev(rows: (Long, Long, Long, String)*) =
      rows.toSeq.toDF("u", "ts", "id", "tp")
    // user 1: a b c d in one session; user 2: a b c; user 3 has a gap
    // after b, so its c d e never joins a's trigrams
    val df = ev(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"), (1L, 40L, 4L, "d"),
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b"), (2L, 30L, 7L, "c"),
      (3L, 10L, 8L, "a"), (3L, 20L, 9L, "b"),
      (3L, 5000L, 10L, "c"), (3L, 5010L, 11L, "d"), (3L, 5020L, 12L, "e"))
    val got = graft.pipeline.Temporal.journeys(df, "u", "ts", "id", "tp",
        gapMicros = 100L, n = 3, minCount = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a b c" -> 2L, "b c d" -> 1L, "c d e" -> 1L))
    // minCount prunes the singletons
    val pruned = graft.pipeline.Temporal.journeys(df, "u", "ts", "id", "tp",
        gapMicros = 100L, n = 3, minCount = 2L)
      .collect().map(r => r.getString(0)).toSeq
    assert(pruned == Seq("a b c"))
  }

  test("burstSegments: islands form on consecutive buckets only") {
    import spark.implicits._
    // key A: hot at days 1,2,3 (run of 3), 5 (singleton), 8,9 (run of 2)
    // key B: never reaches the threshold
    val df = Seq(
      ("A", 1L, 10L), ("A", 2L, 12L), ("A", 3L, 11L), ("A", 4L, 3L),
      ("A", 5L, 15L), ("A", 6L, 2L), ("A", 8L, 10L), ("A", 9L, 10L),
      ("B", 1L, 5L), ("B", 2L, 5L)
    ).toDF("k", "day", "cnt")
    val got = graft.pipeline.Temporal.burstSegments(df, "k", "day", "cnt",
        threshold = 10L, minLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // the day-5 singleton is pruned by minLen; day 4/6 gaps split runs
    assert(got == Set(("A", 1L, 3L, 33L), ("A", 8L, 2L, 20L)))
    // minLen = 1 readmits the singleton
    val all = graft.pipeline.Temporal.burstSegments(df, "k", "day", "cnt",
        threshold = 10L, minLen = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(all == Set(("A", 1L), ("A", 5L), ("A", 8L)))
  }

  test("ewmaSmooth: exact truncated half-decay weights, heads renormalize") {
    import spark.implicits._
    val df = Seq(("k", 1L, 10L), ("k", 2L, 20L), ("k", 3L, 40L),
      ("j", 1L, 5L)).toDF("key", "ord", "v")
    val got = graft.pipeline.Temporal.ewmaSmooth(df, "key", "ord", "v",
        lags = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    // lags=3 weights (current..oldest) = 4,2,1
    // k@1: only current -> 1000*10*4/4 = 10000
    assert(got(("k", 1L)) == 10000L)
    // k@2: (20*4 + 10*2)*1000 div 6 = 100000 div 6 = 16666
    assert(got(("k", 2L)) == 100000L / 6)
    // k@3: (40*4 + 20*2 + 10*1)*1000 div 7 = 210000 div 7 = 30000
    assert(got(("k", 3L)) == 30000L)
    // singleton key: its own value
    assert(got(("j", 1L)) == 5000L)
  }
}
