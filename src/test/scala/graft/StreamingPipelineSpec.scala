package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

class StreamingPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("streaming exact dedup drops later copies within the watermark") {
    val dir = Files.createTempDirectory("stream-dedup").toString
    val rows = Seq(
      (1L, "alpha text", Timestamp.valueOf("2026-01-01 00:00:00")),
      (2L, "beta text", Timestamp.valueOf("2026-01-01 00:01:00")),
      (3L, "alpha text", Timestamp.valueOf("2026-01-01 00:02:00")), // dup of 1
      (4L, "gamma text", Timestamp.valueOf("2026-01-01 00:03:00")),
      (5L, "beta text", Timestamp.valueOf("2026-01-01 00:04:00")))  // dup of 2
    val df = rows.toDF("doc_id", "text", "ts")
    df.write.mode("overwrite").parquet(dir)

    val deduped = StreamingPipeline.dedupExact(
      spark.readStream.schema(df.schema).parquet(dir), "text", "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT text FROM dedup_stream").collect().map(_.getString(0))
    assert(out.length == 3, out.mkString(","))
    assert(out.toSet == Set("alpha text", "beta text", "gamma text"))
  }

  test("streaming bloom filter drops reference-corpus duplicates, passes novel") {
    val dir = Files.createTempDirectory("stream-bloom").toString
    // static reference corpus
    val ref = Seq((100L, "ref doc one"), (101L, "ref doc two"))
      .toDF("doc_id", "text")
    val bits = graft.pipeline.BloomDedup.bloomBits(ref, "text", 16384, 4)
    val rows = Seq(
      (1L, "ref doc one", Timestamp.valueOf("2026-01-01 00:00:00")),  // dup
      (2L, "fresh doc a", Timestamp.valueOf("2026-01-01 00:01:00")),
      (3L, "ref doc two", Timestamp.valueOf("2026-01-01 00:02:00")),  // dup
      (4L, "fresh doc b", Timestamp.valueOf("2026-01-01 00:03:00")))
    val df = rows.toDF("doc_id", "text", "ts")
    df.write.mode("overwrite").parquet(dir)

    val filtered = StreamingPipeline.dedupAgainstBloom(
      spark.readStream.schema(df.schema).parquet(dir), "text", bits, 4)
    val q = filtered.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT text FROM bloom_stream").collect().map(_.getString(0))
    assert(out.toSet == Set("fresh doc a", "fresh doc b"), out.mkString(","))
  }

  test("stateless cleaning + chunking run unchanged under readStream") {
    val dir = Files.createTempDirectory("stream-chunk").toString
    val rows = Seq(
      (1L, "  The   QUICK brown fox jumps over the lazy dog  ",
        Timestamp.valueOf("2026-01-01 00:00:00")))
    val df = rows.toDF("doc_id", "text", "ts")
    df.write.mode("overwrite").parquet(dir)

    val cleaned = spark.readStream.schema(df.schema).parquet(dir)
      .withColumn("clean", graft.pipeline.TextNorm.clean(col("text")))
    val chunked = graft.pipeline.Chunking.chunk(cleaned, "doc_id", "clean",
      sizeTokens = 4, overlap = 0)
    val q = chunked.writeStream.format("memory").queryName("chunk_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT chunk_text FROM chunk_stream ORDER BY chunk_idx")
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("the quick brown fox", "jumps over the lazy", "dog"))
  }

  test("curation gate (gopher + quality + language) is stream/batch identical") {
    import graft.pipeline.{GopherRules, TextFunctions}
    val dir = Files.createTempDirectory("stream-gate").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200).write.mode("overwrite").parquet(dir)
    def gate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      GopherRules.metrics(df, "doc_id", "text")
        .join(df.select(col("doc_id"),
          TextFunctions.quality_score(col("text")).as("quality"),
          TextFunctions.language_id(col("text")).as("lang_guess")), Seq("doc_id"))
    val batchDf = spark.read.parquet(dir)
    val batch = gate(batchDf).collect().map(_.toString).sorted.toSeq
    val q = gate(spark.readStream.schema(batchDf.schema).parquet(dir))
      .writeStream.format("memory").queryName("gate_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("gate_stream").collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("streaming simhash blocking drops a near-duplicate within the horizon") {
    val dir = Files.createTempDirectory("stream-neardup").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (1L, base, Timestamp.valueOf("2026-01-01 00:00:00")),
      // near-dup of 1: one token changed out of 40 -> tiny hamming distance
      (2L, base.replace("w17", "z17"), Timestamp.valueOf("2026-01-01 00:01:00")),
      // unrelated vocabulary -> far in simhash space
      (3L, (1 to 40).map(i => s"q${i}x").mkString(" "), Timestamp.valueOf("2026-01-01 00:02:00")))
    val df = rows.toDF("doc_id", "text", "ts")
    df.write.mode("overwrite").parquet(dir)

    val drops = StreamingPipeline.dedupNearSimHash(
      spark.readStream.schema(df.schema).parquet(dir),
      "doc_id", "text", "ts", "10 minutes", maxHamming = 6)
    val q = drops.toDF().writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT DISTINCT doc_id, dup_of FROM neardup_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((2L, 1L)),
      s"expected exactly the planted near-dup (2 dropped as dup of 1), got ${out.mkString(", ")}")
  }

  test("simhash state carries across runs via checkpoint; horizon bounds it") {
    val dir = Files.createTempDirectory("stream-neardup2").toString
    val ckpt = Files.createTempDirectory("stream-neardup2-ckpt").toString
    val base = (1 to 40).map(i => s"v$i").mkString(" ")
    val schema = Seq((1L, "x", Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("doc_id", "text", "ts").schema

    val outDir = Files.createTempDirectory("stream-neardup2-out").toString
    def run(): Array[(Long, Long)] = {
      // file sink + checkpoint: the memory sink cannot recover state
      val drops = StreamingPipeline.dedupNearSimHash(
        spark.readStream.schema(schema).parquet(dir),
        "doc_id", "text", "ts", "10 minutes", maxHamming = 8)
      val q = drops.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).select("doc_id", "dup_of")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    }

    // run 1: the original document only — nothing to drop
    Seq((1L, base, Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("doc_id", "text", "ts").write.mode("overwrite").parquet(dir)
    assert(run().isEmpty)

    // run 2: a near-dup 1 minute later, in a NEW micro-batch — the
    // checkpointed bucket state from run 1 catches it
    Seq((2L, base.replace("v9", "z9"), Timestamp.valueOf("2026-01-01 00:01:00")))
      .toDF("doc_id", "text", "ts").write.mode("append").parquet(dir)
    assert(run().toSet == Set((2L, 1L)))

    // in-batch horizon check: a near-dup arriving 2x the horizon after
    // the keeper must NOT be suppressed by the stale entry
    val dir2 = Files.createTempDirectory("stream-neardup3").toString
    Seq(
      (1L, base, Timestamp.valueOf("2026-01-01 00:00:00")),
      (3L, base.replace("v9", "z9"), Timestamp.valueOf("2026-01-01 00:25:00")))
      .toDF("doc_id", "text", "ts").write.mode("overwrite").parquet(dir2)
    val drops3 = StreamingPipeline.dedupNearSimHash(
      spark.readStream.schema(schema).parquet(dir2),
      "doc_id", "text", "ts", "10 minutes", maxHamming = 8)
    val q3 = drops3.toDF().writeStream.format("memory").queryName("neardup_r3")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(60000)
    assert(spark.sql("SELECT * FROM neardup_r3").collect().isEmpty,
      "a keeper beyond the horizon must not suppress a later doc")
  }

  test("mapGroupsWithState keeps running per-key corpus stats across batches") {
    val dir = Files.createTempDirectory("stream-stats").toString
    val batch1 = Seq(("en", "hello world"), ("en", "more text"), ("fr", "bonjour"))
    batch1.toDF("lang", "text").write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(batch1.toDF("lang", "text").schema).parquet(dir)
      .as[(String, String)]
    val stats = StreamingPipeline.runningCorpusStats(stream)
    val q = stats.toDF().writeStream.format("memory").queryName("stats_stream")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val r1 = spark.sql("SELECT key, docs, chars FROM stats_stream ORDER BY key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(r1.contains(("en", 2L, 20L)), r1.mkString(","))
    assert(r1.contains(("fr", 1L, 7L)))

    // second micro-batch: state carries over (en count grows from 2 to 3)
    Seq(("en", "third doc")).toDF("lang", "text")
      .write.mode("append").parquet(dir)
    val q2 = StreamingPipeline.runningCorpusStats(
      spark.readStream.schema(batch1.toDF("lang", "text").schema).parquet(dir)
        .as[(String, String)])
      .toDF().writeStream.format("memory").queryName("stats_stream2")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val en = spark.sql("SELECT docs FROM stats_stream2 WHERE key = 'en'")
      .collect().map(_.getLong(0)).max
    assert(en == 3L)
  }

  test("stream-stream interval join pairs points with containing spans") {
    val pdir = Files.createTempDirectory("stream-ij-pts").toString
    val sdir = Files.createTempDirectory("stream-ij-spans").toString
    val pts = Seq(
      ("u1", Timestamp.valueOf("2026-01-01 00:05:00"), 101L),
      ("u1", Timestamp.valueOf("2026-01-01 00:25:00"), 102L), // outside span
      ("u2", Timestamp.valueOf("2026-01-01 00:10:00"), 103L),
      ("u1", Timestamp.valueOf("2026-01-01 00:19:59"), 104L), // just inside
      ("u1", Timestamp.valueOf("2026-01-01 00:20:00"), 105L)) // end excluded
      .toDF("k", "ts", "pid")
    val spans = Seq(
      ("u1", Timestamp.valueOf("2026-01-01 00:00:00"),
        Timestamp.valueOf("2026-01-01 00:20:00"), 1L),
      ("u3", Timestamp.valueOf("2026-01-01 00:00:00"),
        Timestamp.valueOf("2026-01-01 00:30:00"), 2L))
      .toDF("k", "lo", "hi", "sid")
    pts.write.mode("overwrite").parquet(pdir)
    spans.write.mode("overwrite").parquet(sdir)

    val joined = StreamingPipeline.intervalJoinStream(
      spark.readStream.schema(pts.schema).parquet(pdir),
      spark.readStream.schema(spans.schema).parquet(sdir),
      "k", "ts", "lo", "hi", watermark = "5 minutes", maxSpan = "30 minutes")
    // streaming symmetric-hash join, not a batch fallback
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory").queryName("ij_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT pid, span_sid FROM ij_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((101L, 1L), (104L, 1L)),
      s"expected only in-span pairs with half-open end, got $got")
  }

  test("session_window splits streams on the inactivity gap, batch-parity") {
    val dir = Files.createTempDirectory("stream-sessions").toString
    val rows = Seq(
      // user 1: two events 1 min apart, then a 30-min silence, then one more
      (1L, Timestamp.valueOf("2026-01-01 00:00:00"), 10.0),
      (1L, Timestamp.valueOf("2026-01-01 00:01:00"), 5.0),
      (1L, Timestamp.valueOf("2026-01-01 00:31:00"), 2.0),
      // user 2: one lone event
      (2L, Timestamp.valueOf("2026-01-01 00:05:00"), 7.0),
      // user 99 only exists to push the watermark past every session end:
      // append mode emits a session only once the watermark passes it
      (99L, Timestamp.valueOf("2026-01-01 02:00:00"), 0.0))
    val df = rows.toDF("user_id", "ts", "value")
    df.write.mode("overwrite").parquet(dir)

    val sessions = StreamingPipeline.sessionize(
      spark.readStream.schema(df.schema).parquet(dir),
      "user_id", "ts", "value", gap = "10 minutes", watermark = Some("10 minutes"))
    val q = sessions.writeStream.format("memory").queryName("session_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql(
      """SELECT user_id, n_events, total_value FROM session_stream
        |WHERE user_id < 99 ORDER BY user_id, n_events DESC""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 15.0), (1L, 1L, 2.0), (2L, 1L, 7.0)),
      out.mkString(","))

    // batch parity: the same call over the static frame gives the same sessions
    val batch = StreamingPipeline.sessionize(df, "user_id", "ts", "value", "10 minutes")
      .where(col("user_id") < 99)
      .orderBy(col("user_id"), col("n_events").desc)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(4)))
    assert(batch.toSeq == Seq((1L, 2L, 15.0), (1L, 1L, 2.0), (2L, 1L, 7.0)))
  }

  test("sessionStats gap boundary: exactly-gap merges, one past splits") {
    // session_window's interval is CLOSED at its end: an event at exactly
    // prev + gap still merges (one session), one microsecond later splits.
    // The q_sessions oracle encodes this as `tus - prev > gap`.
    val merged = Seq(
      (1L, Timestamp.valueOf("2026-01-01 00:00:00"), 1.0),
      (1L, Timestamp.valueOf("2026-01-01 00:10:00"), 2.0)) // exactly the gap
      .toDF("user_id", "ts", "value")
    val m = StreamingPipeline.sessionStats(merged, "user_id", "ts", "value", "10 minutes")
      .collect()
    assert(m.length == 1 && m(0).getLong(3) == 2L, m.mkString(","))
    val split = Seq(
      (1L, Timestamp.valueOf("2026-01-01 00:00:00"), 1.0),
      (1L, Timestamp.valueOf("2026-01-01 00:10:00.000001"), 2.0))
      .toDF("user_id", "ts", "value")
    val sp = StreamingPipeline.sessionStats(split, "user_id", "ts", "value", "10 minutes")
      .orderBy("session_start").collect()
    assert(sp.length == 2, sp.mkString(","))
  }

  test("resampleStream emits OHLC buckets, batch-parity with Temporal.resample") {
    val dir = Files.createTempDirectory("stream-resample").toString
    val rows = Seq(
      (1L, Timestamp.valueOf("2026-01-01 00:00:05"), 5L),
      (1L, Timestamp.valueOf("2026-01-01 00:00:20"), 2L),
      (1L, Timestamp.valueOf("2026-01-01 00:00:55"), 8L),
      (1L, Timestamp.valueOf("2026-01-01 00:01:10"), 1L),
      (2L, Timestamp.valueOf("2026-01-01 00:00:30"), 7L),
      // watermark pusher: append mode finalizes earlier windows
      (99L, Timestamp.valueOf("2026-01-01 02:00:00"), 0L))
      .toDF("user_id", "ts", "v")
    rows.write.mode("overwrite").parquet(dir)

    val stream = StreamingPipeline.resampleStream(
      spark.readStream.schema(rows.schema).parquet(dir)
        .withWatermark("ts", "10 minutes"),
      "user_id", "ts", "v", width = "1 minute")
    val q = stream.writeStream.format("memory").queryName("resample_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql(
      """SELECT user_id, bucket_start, open, high, low, close, n, total
        |FROM resample_stream WHERE user_id < 99
        |ORDER BY user_id, bucket_start""".stripMargin)
      .collect().map(_.toSeq).toSeq

    // batch parity: same rows from the batch operator at the same width
    val batch = graft.pipeline.Temporal.resample(
        rows.where(col("user_id") < 99), "user_id", "ts", "v",
        bucketWidth = 60L * 1000000L)
      .orderBy("user_id", "bucket_start").collect().map(_.toSeq).toSeq
    assert(got == batch, s"stream=$got batch=$batch")
    assert(got.map(r => (r(0), r(2), r(5), r(6), r(7))) == Seq(
      (1L, 5L, 8L, 3L, 15L), (1L, 1L, 1L, 1L, 1L), (2L, 7L, 7L, 1L, 7L)))
  }

  test("asofJoinStream single batch equals the batch asofJoin row-for-row") {
    val dir = Files.createTempDirectory("stream-asof").toString
    val rnd = new scala.util.Random(23)
    val rights = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong * 1000L, i.toDouble))
    val lefts = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong * 1000L))
    val rdf = rights.toDF("user_id", "tus", "value")
    val ldf = lefts.toDF("event_id", "user_id", "tus")
    rdf.write.mode("overwrite").parquet(s"$dir/right")
    ldf.write.mode("overwrite").parquet(s"$dir/left")

    val out = StreamingPipeline.asofJoinStream(
      spark.readStream.schema(ldf.schema).parquet(s"$dir/left"),
      spark.readStream.schema(rdf.schema).parquet(s"$dir/right"),
      "user_id", "event_id", "tus", "tus", "value")
    val q = out.toDF().writeStream.format("memory").queryName("asof_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT * FROM asof_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4))).toSet

    // batch oracle: right pre-aggregated to unique (key, ts) by max
    // value — the same tie-break the stream state applies
    val views = rdf.groupBy("user_id", "tus").agg(max("value").as("value"))
    val expected = graft.pipeline.Temporal.asofJoin(
        ldf, views, "user_id", "tus", "tus", rightPrefix = "view_")
      .select("event_id", "user_id", "tus", "view_tus", "view_value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4))).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._4 != null) && got.exists(_._4 == null))
  }

  test("asofJoinStream state carries the latest reference across runs") {
    val dir = Files.createTempDirectory("stream-asof2").toString
    val ckpt = Files.createTempDirectory("stream-asof2-ckpt").toString
    val outDir = Files.createTempDirectory("stream-asof2-out").toString
    val rSchema = Seq((1L, 1L, 1.0)).toDF("user_id", "tus", "value").schema
    val lSchema = Seq((1L, 1L, 1L)).toDF("event_id", "user_id", "tus").schema

    def run(): Set[(Long, Long, Any, Any)] = {
      val out = StreamingPipeline.asofJoinStream(
        spark.readStream.schema(lSchema).parquet(s"$dir/left"),
        spark.readStream.schema(rSchema).parquet(s"$dir/right"),
        "user_id", "event_id", "tus", "tus", "value")
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(2),
          if (r.isNullAt(3)) null else r.getLong(3),
          if (r.isNullAt(4)) null else r.getDouble(4))).toSet
    }

    // run 1: references only — nothing emitted
    Seq((7L, 100L, 1.5), (7L, 200L, 2.5))
      .toDF("user_id", "tus", "value").write.mode("overwrite").parquet(s"$dir/right")
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], lSchema)
      .write.mode("overwrite").parquet(s"$dir/left")
    assert(run().isEmpty)

    // run 2: left rows in a NEW micro-batch match the checkpointed
    // latest reference (t=200); one row predates it -> no match
    Seq((1L, 7L, 250L), (2L, 7L, 150L))
      .toDF("event_id", "user_id", "tus").write.mode("append").parquet(s"$dir/left")
    assert(run() == Set(
      (1L, 250L, 200L, 2.5),   // latest-known reference
      (2L, 150L, null, null))) // older than the retained latest: no match
  }

  test("funnelStream single batch equals the batch funnel row-for-row") {
    val dir = Files.createTempDirectory("stream-funnel").toString
    val rnd = new scala.util.Random(31)
    val steps = Seq("a", "b", "c")
    val rows = (1 to 1200).map(_ => (rnd.nextInt(30).toLong,
      rnd.nextInt(500).toLong, s"s${rnd.nextInt(2)}" match {
        case "s0" => Seq("a", "b", "c", "noise")(rnd.nextInt(4))
        case _ => Seq("a", "b", "c", "noise")(rnd.nextInt(4))
      }))
    val df = rows.toDF("user_id", "tus", "step")
    df.write.mode("overwrite").parquet(dir)

    val out = StreamingPipeline.funnelStream(
      spark.readStream.schema(df.schema).parquet(dir),
      "user_id", "tus", "step", steps, within = Some(200L))
    val q = out.toDF().writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT * FROM funnel_stream").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toList, r.getInt(2))).toSet

    val expected = graft.pipeline.Temporal.funnel(
        df, "user_id", "tus", "step", steps, within = Some(200L))
      .collect()
      .map(r => (r.getLong(0),
        (1 to 3).map(i => if (r.isNullAt(i)) -1L else r.getLong(i)).toList,
        r.getInt(4))).toSet
    assert(got == expected)
    assert(got.exists(_._3 == 3) && got.exists(_._3 < 3)) // non-trivial mix
  }

  test("funnelStream latches progression across micro-batches") {
    val dir = Files.createTempDirectory("stream-funnel2").toString
    val ckpt = Files.createTempDirectory("stream-funnel2-ckpt").toString
    val outDir = Files.createTempDirectory("stream-funnel2-out").toString
    val schema = Seq((1L, 1L, "a")).toDF("user_id", "tus", "step").schema

    def run(): Map[Long, (List[Long], Int)] = {
      val out = StreamingPipeline.funnelStream(
        spark.readStream.schema(schema).parquet(dir),
        "user_id", "tus", "step", Seq("a", "b"))
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      // latest progression per key = the row with the most steps
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), (r.getSeq[Long](1).toList, r.getInt(2))))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).maxBy(_._2) }
    }

    // batch 1: only the first step reaches
    Seq((5L, 100L, "a"), (5L, 50L, "b")) // b BEFORE a: must not latch
      .toDF("user_id", "tus", "step").write.mode("overwrite").parquet(dir)
    assert(run()(5L) == (List(100L, -1L), 1))

    // batch 2: a later b completes the funnel against the CHECKPOINTED
    // step-1 time; an even-earlier a cannot retroactively re-time step 1
    Seq((5L, 150L, "b"), (5L, 10L, "a"))
      .toDF("user_id", "tus", "step").write.mode("append").parquet(dir)
    assert(run()(5L) == (List(100L, 150L), 2))
  }

  test("CMS sketch aggregates across micro-batches (ADD-merge in the state store)") {
    val dir = Files.createTempDirectory("stream-cms").toString
    val ckpt = Files.createTempDirectory("stream-cms-ckpt").toString
    val schema = Seq(1L).toDF("k").schema

    def run(): Seq[Long] = {
      val sk = spark.readStream.schema(schema).parquet(dir)
        .agg(graft.pipeline.Cms.sketch(col("k"), 4, 64).as("sk"))
      val q = sk.writeStream.format("memory").queryName("cms_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.sql("SELECT sk FROM cms_stream").head.getSeq[Long](0)
    }

    Seq(7L, 7L, 9L).toDF("k").write.mode("overwrite").parquet(dir)
    val s1 = run()
    assert(s1.sum == 4L * 3) // 3 keys x 4 sketch rows
    // batch 2 adds more of key 7; the checkpointed sketch accumulates
    Seq(7L, 7L).toDF("k").write.mode("append").parquet(dir)
    val s2 = run()
    assert(s2.sum == 4L * 5)
    // the streamed two-batch sketch equals the one-shot batch sketch
    val batch = Seq(7L, 7L, 9L, 7L, 7L).toDF("k")
      .agg(graft.pipeline.Cms.sketch(col("k"), 4, 64)).head.getSeq[Long](0)
    assert(s2 == batch)
  }

  test("latest-wins compaction applies a changelog stream incrementally (CDC apply)") {
    val dir = Files.createTempDirectory("stream-cdc").toString
    val ckpt = Files.createTempDirectory("stream-cdc-ckpt").toString
    val schema = Seq(("k", 1L, 1L, "v")).toDF("k", "ver", "uniq", "v").schema

    def run(): Map[String, (Long, String)] = {
      // the streaming face of Joins.compactLatest: the same max_by
      // aggregate keeps ONE struct per key in the state store
      val latest = spark.readStream.schema(schema).parquet(dir)
        .groupBy("k")
        .agg(max_by(struct(col("ver"), col("v")), struct(col("ver"), col("uniq"))).as("last"))
        .select(col("k"), col("last.ver").as("ver"), col("last.v").as("v"))
      val q = latest.writeStream.format("memory").queryName("cdc_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.sql("SELECT k, ver, v FROM cdc_stream").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    }

    Seq(("u1", 1L, 1L, "a"), ("u2", 5L, 2L, "x"))
      .toDF("k", "ver", "uniq", "v").write.mode("overwrite").parquet(dir)
    assert(run() == Map("u1" -> (1L, "a"), "u2" -> (5L, "x")))

    // batch 2: u1 advances twice (out of order); state keeps the max
    Seq(("u1", 3L, 3L, "c"), ("u1", 2L, 4L, "b"))
      .toDF("k", "ver", "uniq", "v").write.mode("append").parquet(dir)
    assert(run() == Map("u1" -> (3L, "c"), "u2" -> (5L, "x")))
  }

  test("HLL sketch MAX-merges across micro-batches (streaming distinct count)") {
    val dir = Files.createTempDirectory("stream-hll").toString
    val ckpt = Files.createTempDirectory("stream-hll-ckpt").toString
    val schema = Seq(1L).toDF("k").schema

    def run(): Seq[Long] = {
      val sk = spark.readStream.schema(schema).parquet(dir)
        .agg(graft.pipeline.Hll.sketch(col("k"), 64).as("sk"))
      val q = sk.writeStream.format("memory").queryName("hll_stream")
        .option("checkpointLocation", ckpt)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.sql("SELECT sk FROM hll_stream").head.getSeq[Long](0)
    }

    Seq(7L, 7L, 9L, 21L).toDF("k").write.mode("overwrite").parquet(dir)
    run()
    // batch 2 adds dups of old keys and one new key; registers MAX-merge
    // in the state store, so the stream equals the one-shot batch sketch
    Seq(7L, 9L, 33L).toDF("k").write.mode("append").parquet(dir)
    val s2 = run()
    val batch = Seq(7L, 7L, 9L, 21L, 7L, 9L, 33L).toDF("k")
      .agg(graft.pipeline.Hll.sketch(col("k"), 64)).head.getSeq[Long](0)
    assert(s2 == batch)
    assert(s2.count(_ > 0L) >= 3) // 4 distinct keys hit >= 3 registers
  }

  test("sessionStats accepts a numeric epoch-micros event time directly") {
    // schema-adaptive event time: a long micros column sessionizes to
    // exactly the same rows as its timestamp_micros lift
    val numeric = Seq((1L, 0L, 1.0), (1L, 600000000L, 2.0),
      (1L, 1800000001L, 3.0), (2L, 5L, 4.0)).toDF("user_id", "ts", "value")
    val typed = numeric.withColumn("ts", timestamp_micros(col("ts")))
    val a = StreamingPipeline.sessionStats(numeric, "user_id", "ts", "value", "10 minutes")
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
    val b = StreamingPipeline.sessionStats(typed, "user_id", "ts", "value", "10 minutes")
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
    assert(a == b && a.length == 3, a.mkString(","))
  }

  test("scd2Stream single batch equals the batch scd2's closed rows") {
    val dir = Files.createTempDirectory("stream-scd2").toString
    val rnd = new scala.util.Random(29)
    val log = (1 to 400).map(i =>
      (rnd.nextInt(6).toLong, rnd.nextInt(500).toLong * 1000L, i.toLong,
        rnd.nextInt(100).toDouble))
    val df = log.toDF("k", "tus", "id", "v")
    df.write.mode("overwrite").parquet(s"$dir/log")

    val out = StreamingPipeline.scd2Stream(
      spark.readStream.schema(df.schema).parquet(s"$dir/log"),
      "k", "tus", "id", "v")
    val q = out.toDF().writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT * FROM scd2_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet

    val expected = graft.pipeline.Temporal.scd2(df, Seq("k"), "tus", Seq("id"))
      .where(col("valid_to_us").isNotNull)
      .select("k", "id", "v", "valid_from_us", "valid_to_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("scd2Stream carries the open version across runs; stragglers close instantly") {
    val dir = Files.createTempDirectory("stream-scd2b").toString
    val ckpt = Files.createTempDirectory("stream-scd2b-ckpt").toString
    val outDir = Files.createTempDirectory("stream-scd2b-out").toString
    val schema = Seq((1L, 1L, 1L, 1.0)).toDF("k", "tus", "id", "v").schema

    def run(): Set[(Long, Long, Double, Long, Long)] = {
      val out = StreamingPipeline.scd2Stream(
        spark.readStream.schema(schema).parquet(s"$dir/log"), "k", "tus", "id", "v")
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4))).toSet
    }

    // run 1: one version per key — everything stays open, nothing emits
    Seq((7L, 100L, 1L, 1.5)).toDF("k", "tus", "id", "v")
      .write.mode("overwrite").parquet(s"$dir/log")
    assert(run().isEmpty)

    // run 2: within-batch rows sort by (t, id) before applying, so the
    // checkpointed open version closes in event-time order
    Seq((7L, 300L, 2L, 2.5), (7L, 200L, 3L, 9.9)).toDF("k", "tus", "id", "v")
      .write.mode("append").parquet(s"$dir/log")
    assert(run() == Set(
      (7L, 1L, 1.5, 100L, 200L),
      (7L, 3L, 9.9, 200L, 300L)))

    // run 3: a CROSS-batch straggler older than the open version closes
    // instantly at the open version's start — emitted history stays
    // append-only, the open version (t=300) is untouched
    Seq((7L, 250L, 4L, 4.4)).toDF("k", "tus", "id", "v")
      .write.mode("append").parquet(s"$dir/log")
    assert(run() == Set(
      (7L, 1L, 1.5, 100L, 200L),
      (7L, 3L, 9.9, 200L, 300L),
      (7L, 4L, 4.4, 250L, 300L)))
  }

  test("attributionStream single batch equals batch attribution row-for-row") {
    val dir = Files.createTempDirectory("stream-attr").toString
    val rnd = new scala.util.Random(47)
    val types = Seq("click", "view", "purchase", "error")
    val rows = (1 to 1500).map(i => (i.toLong, rnd.nextInt(25).toLong,
      rnd.nextInt(800).toLong, types(rnd.nextInt(4))))
    val df = rows.toDF("event_id", "user_id", "tus", "event_type")
    df.write.mode("overwrite").parquet(dir)

    val out = StreamingPipeline.attributionStream(
      spark.readStream.schema(df.schema).parquet(dir),
      "user_id", "event_id", "tus", "event_type", "purchase",
      Seq("click", "view"), lookbackMicros = 100L)
    val q = out.toDF().writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql(
      "SELECT conversionId, firstTouchId, lastTouchId FROM attr_stream")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet

    val expected = graft.pipeline.Temporal.attribution(df, "user_id",
        "event_id", "tus", "event_type", "purchase", Seq("click", "view"), 100L)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(6)) -1L else r.getLong(6))).toSet
    assert(got == expected)
    assert(got.exists(_._2 >= 0) && got.exists(_._2 == -1L)) // non-trivial mix
  }

  test("psiWindowed: a matching window scores ~0, a shifted window alarms") {
    val dir = Files.createTempDirectory("stream-psi").toString
    // reference: uniform 0..99 — decile bounds 10,20,…,90, 100 per bucket
    val refBounds = (1 until 10).map(i => (i * 10).toLong).toArray
    val refCounts = Array.fill(10)(100L)
    // window 1 (t in [0,60s)): same uniform; window 2: everything +80
    val rows = (0 until 1000).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 00:00:${i % 50}%02d"), (i % 100).toLong)) ++
      (0 until 1000).map(i =>
        (java.sql.Timestamp.valueOf(f"2024-01-01 00:01:${i % 50}%02d"), (i % 100 + 80).toLong))
    val df = rows.toDF("ts", "v")
    df.write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.psiWindowed(
      spark.readStream.schema(df.schema).parquet(dir),
      "ts", "v", refBounds, refCounts, "1 minute")
    val q = out.writeStream.format("memory").queryName("psi_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql(
      "SELECT window_start, n_events, psi_unats FROM psi_stream ORDER BY window_start")
      .collect()
    assert(got.length == 2)
    assert(got(0).getLong(1) == 1000L && got(1).getLong(1) == 1000L)
    assert(math.abs(got(0).getLong(2)) < 5000L, s"calm window: ${got(0)}")
    assert(got(1).getLong(2) > 250000L, s"shifted window: ${got(1)}")
  }

  test("cusumStream single batch equals the batch cusum row-for-row") {
    val dir = Files.createTempDirectory("stream-cusum").toString
    val rnd = new scala.util.Random(11)
    val rows = for (k <- 0 until 8; t <- 0 until 80)
      yield (k.toLong, t.toLong, (10 + rnd.nextInt(11)).toLong)
    val df = rows.toDF("k", "t", "x")
    df.write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.cusumStream(
      spark.readStream.schema(df.schema).parquet(dir),
      "k", "t", "x", ref = 15L, slack = 1L, threshold = 8L)
    val q = out.toDF().writeStream.format("memory").queryName("cusum_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT key, t, cusumHi, cusumLo, isChange FROM cusum_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val expected = graft.pipeline.Stats.cusum(df, Seq("k"), "t", "x", 15L, 1L, 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == expected)
    assert(got.values.exists(_._3) && got.values.exists(!_._3)) // non-trivial mix
  }

  test("cusumStream carries the closed-form state across micro-batches") {
    val dir = Files.createTempDirectory("stream-cusum2").toString
    val ckpt = Files.createTempDirectory("stream-cusum2-ckpt").toString
    val outDir = Files.createTempDirectory("stream-cusum2-out").toString
    val part1 = (0 until 10).map(t => (1L, t.toLong, 15L))
    val part2 = (10 until 15).map(t => (1L, t.toLong, 25L)) // level shift
    val schema = part1.toDF("k", "t", "x").schema
    part1.toDF("k", "t", "x").write.mode("overwrite").parquet(dir)
    def run(): Set[Long] = {
      val out = StreamingPipeline.cusumStream(
        spark.readStream.schema(schema).parquet(dir),
        "k", "t", "x", ref = 15L, slack = 1L, threshold = 12L)
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).where(col("isChange"))
        .collect().map(_.getAs[Long]("t")).toSet
    }
    assert(run().isEmpty)
    part2.toDF("k", "t", "x").write.mode("append").parquet(dir)
    // batch semantics across the restart: S+ crosses 12 at t=11
    assert(run() == Set(11L, 12L, 13L, 14L))
  }

  test("anomalyStream flags against prefix moments, state spans batches") {
    val dir = Files.createTempDirectory("stream-z").toString
    val ckpt = Files.createTempDirectory("stream-z-ckpt").toString
    val outDir = Files.createTempDirectory("stream-z-out").toString
    // steady 10s, then a 100 spike: the spike must flag against the
    // prefix moments; the steady rows must not
    val part1 = (0 until 20).map(t => (1L, t.toLong, 10L))
    val part2 = Seq((1L, 20L, 100L), (1L, 21L, 10L))
    val schema = part1.toDF("k", "t", "x").schema
    part1.toDF("k", "t", "x").write.mode("overwrite").parquet(dir)
    def run(): Map[Long, (Long, Boolean)] = {
      val out = StreamingPipeline.anomalyStream(
        spark.readStream.schema(schema).parquet(dir),
        "k", "t", "x", kNum = 3, kDen = 1)
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => r.getAs[Long]("t") ->
          ((r.getAs[Long]("nSoFar"), r.getAs[Boolean]("isAnomaly")))).toMap
    }
    val first = run()
    assert(first.size == 20 && first.values.forall(!_._2)) // constant: no flags
    assert(first(19L)._1 == 20L)
    part2.toDF("k", "t", "x").write.mode("append").parquet(dir)
    val second = run()
    // prefix count carried across the restart: t=20 is row 21
    assert(second(20L)._1 == 21L && second(20L)._2, second.toString)
    // the hand fold: after the spike, t=21's value 10 sits within 3 sigma
    assert(second(21L)._1 == 22L && !second(21L)._2, second.toString)
  }

  test("ewmaStream single batch equals the batch ewmaSmooth row-for-row") {
    val dir = Files.createTempDirectory("stream-ewma").toString
    val rnd = new scala.util.Random(7)
    val rows = for (k <- 0 until 6; t <- 0 until 50)
      yield (k.toLong, t.toLong, (100 + rnd.nextInt(900)).toLong)
    val df = rows.toDF("k", "t", "x")
    df.write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.ewmaStream(
      spark.readStream.schema(df.schema).parquet(dir), "k", "t", "x", lags = 8)
    val q = out.toDF().writeStream.format("memory").queryName("ewma_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql("SELECT key, t, ewmaMilli FROM ewma_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = graft.pipeline.Temporal.ewmaSmooth(df, "k", "t", "x", lags = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Long]("ewma_milli")).toMap
    assert(got == expected)
    assert(got.size == rows.size)
  }

  test("sprtStream single batch ends each key at the batch sprt verdict") {
    val dir = Files.createTempDirectory("stream-sprt").toString
    val rows =
      (1 to 20).map(i => ("a", i.toLong, true)) ++
      (1 to 10).map(i => ("b", i.toLong, true)) ++
      (1 to 14).map(i => ("c", i.toLong, false))
    val df = rows.toDF("k", "t", "succ")
    df.write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.sprtStream(
      spark.readStream.schema(df.schema).parquet(dir), "k", "t", "succ")
    val q = out.toDF().writeStream.format("memory").queryName("sprt_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // last row per key == the batch operator's verdict
    val last = spark.sql(
        """SELECT key, n, llrMicro, decision, decidedAt FROM sprt_stream s
          |WHERE n = (SELECT MAX(n) FROM sprt_stream WHERE key = s.key)""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    val batch = graft.pipeline.Stats.sprt(df, Seq("k"), "t", "succ")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(4), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(last == batch)
    // the verdict latches at the crossing and never flips after
    val aRows = spark.sql("SELECT n, decision FROM sprt_stream WHERE key = 'a' ORDER BY n")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(aRows.take(16).forall(_._2 == "continue"))
    assert(aRows.drop(16).forall(_._2 == "accept_h1"))
  }

  test("sprtStream latch survives micro-batch boundaries and restarts") {
    val dir = Files.createTempDirectory("stream-sprt2").toString
    val ckpt = Files.createTempDirectory("stream-sprt2-ckpt").toString
    val outDir = Files.createTempDirectory("stream-sprt2-out").toString
    val part1 = (1 to 17).map(i => ("a", i.toLong, true))   // crosses H1 at 17
    val part2 = (18 to 22).map(i => ("a", i.toLong, false)) // contrary evidence
    val schema = part1.toDF("k", "t", "succ").schema
    part1.toDF("k", "t", "succ").write.mode("overwrite").parquet(dir)
    def run(): Map[Long, (String, Long)] = {
      val out = StreamingPipeline.sprtStream(
        spark.readStream.schema(schema).parquet(dir), "k", "t", "succ")
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => r.getAs[Long]("n") ->
          ((r.getAs[String]("decision"), r.getAs[Long]("decidedAt")))).toMap
    }
    assert(run()(17L) == (("accept_h1", 17L)))
    part2.toDF("k", "t", "succ").write.mode("append").parquet(dir)
    val r2 = run() // restart from checkpoint; contrary rows can't flip the latch
    assert(r2(22L) == (("accept_h1", 17L)))
  }

  test("ewmaStream carries the lag memory across micro-batches") {
    val dir = Files.createTempDirectory("stream-ewma2").toString
    val ckpt = Files.createTempDirectory("stream-ewma2-ckpt").toString
    val outDir = Files.createTempDirectory("stream-ewma2-out").toString
    val part1 = (0 until 6).map(t => (1L, t.toLong, 100L))
    val part2 = Seq((1L, 6L, 900L)) // spike lands on remembered history
    val schema = part1.toDF("k", "t", "x").schema
    part1.toDF("k", "t", "x").write.mode("overwrite").parquet(dir)
    def run(): Map[Long, Long] = {
      val out = StreamingPipeline.ewmaStream(
        spark.readStream.schema(schema).parquet(dir), "k", "t", "x", lags = 4)
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => r.getAs[Long]("t") -> r.getAs[Long]("ewmaMilli")).toMap
    }
    assert(run()(5L) == 100000L) // steady state: constant 100
    part2.toDF("k", "t", "x").write.mode("append").parquet(dir)
    // t=6 sees (900,100,100,100) with weights (8,4,2,1):
    // 1000*(7200+400+200+100)/15 = 526666
    assert(run()(6L) == 1000L * (900 * 8 + 100 * 4 + 100 * 2 + 100) / 15)
  }

  test("attributionStream prunes state to the lookback horizon") {
    val dir = Files.createTempDirectory("stream-attr2").toString
    val df = Seq((1L, 1L, 10L, "view"), (2L, 1L, 500L, "purchase"))
      .toDF("event_id", "user_id", "tus", "event_type")
    df.write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.attributionStream(
      spark.readStream.schema(df.schema).parquet(dir),
      "user_id", "event_id", "tus", "event_type", "purchase",
      Seq("click", "view"), lookbackMicros = 100L)
    val q = out.toDF().writeStream.format("memory").queryName("attr_stream2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val r = spark.sql("SELECT firstTouchId FROM attr_stream2").collect()
    assert(r.length == 1 && r.head.isNullAt(0)) // view at 10 outside [400,500)
  }

  // --- oracle-replay parity: the streaming twins fed the EXACT input of
  // their oracled driver queries (sf0.001 events) must reproduce the
  // batch queries' rows. This closes the oracle-coverage gap for the
  // stream operators without a driver query: the batch side IS
  // DuckDB-verified every round, so stream == batch == oracle. ---

  private val sfDir = "/root/testdata/sf0.001"

  /** The driver queries' schema-adaptive events projection
    * (SparkEntry.eventsMicros): micros since epoch as a long. */
  private def eventsTus = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val tus = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => graft.pipeline.Temporal.epochMicros(ev, "ts")
    }
    ev.withColumn("tus", tus)
  }

  private def optLong(r: org.apache.spark.sql.Row, i: Int): Long =
    if (r.isNullAt(i)) Long.MinValue else r.getLong(i)
  private def optStr(r: org.apache.spark.sql.Row, i: Int): String =
    if (r.isNullAt(i)) "" else r.getString(i)

  test("attributionStream replays the oracled q_attribution rows (sf0.001)") {
    val in = eventsTus.select("event_id", "user_id", "tus", "event_type")
    val dir = Files.createTempDirectory("parity-attr").toString
    in.coalesce(1).write.mode("overwrite").parquet(dir)
    val look = 7L * 24 * 3600 * 1000000L
    val out = StreamingPipeline.attributionStream(
      spark.readStream.schema(in.schema).parquet(dir),
      "user_id", "event_id", "tus", "event_type", "purchase",
      Seq("click", "view"), lookbackMicros = look)
    val q = out.toDF().writeStream.format("memory").queryName("parity_attr")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      """SELECT conversionId, key, convTs, firstTouchId, firstTouchType,
        |firstTouchTs, lastTouchId, lastTouchType, lastTouchTs
        |FROM parity_attr""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        optLong(r, 3), optStr(r, 4), optLong(r, 5),
        optLong(r, 6), optStr(r, 7), optLong(r, 8))).toSet
    val exp = SparkEntry.queries("q_attribution")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        optLong(r, 3), optStr(r, 4), optLong(r, 5),
        optLong(r, 6), optStr(r, 7), optLong(r, 8))).toSet
    assert(got == exp)
    assert(exp.size > 100 && exp.exists(_._4 != Long.MinValue)) // non-trivial
  }

  test("cusumStream replays the oracled q_cusum rows (sf0.001)") {
    // the batch query's exact input: daily per-type event counts; the
    // stream key must be numeric, so types get a deterministic code and
    // rows map back through it for the compare
    val daily = eventsTus
      .groupBy(col("event_type"), expr("tus div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val types = daily.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.zipWithIndex.toMap
    val code = typedLit(types)
    val in = daily.select(code(col("event_type")).cast("long").as("k"),
      col("day").cast("long").as("day"), col("x"))
    val dir = Files.createTempDirectory("parity-cusum").toString
    in.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.cusumStream(
      spark.readStream.schema(in.schema).parquet(dir),
      "k", "day", "x", ref = 65L, slack = 5L, threshold = 40L)
    val q = out.toDF().writeStream.format("memory").queryName("parity_cusum")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      "SELECT key, t, x, cusumHi, cusumLo, isChange FROM parity_cusum")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val exp = SparkEntry.queries("q_cusum")(spark, sfDir)
      .collect().map(r => (types(r.getString(0)).toLong, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == exp)
    assert(exp.size > 100 && exp.values.exists(_._4)) // change points exist
  }

  test("debounceStream replays the oracled q_debounce rows (sf0.001)") {
    // the batch query's exact input; its composite (user_id, event_type)
    // key packs into one long through a deterministic type code
    val base = eventsTus.select(col("event_id"), col("user_id"),
      col("event_type"), col("tus"))
    val types = base.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.zipWithIndex.toMap
    val code = typedLit(types)
    val in = base.select(
      (col("user_id").cast("long") * types.size +
        code(col("event_type")).cast("long")).as("k"),
      col("tus"), col("event_id"))
    val dir = Files.createTempDirectory("parity-debounce").toString
    in.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.debounceStream(
      spark.readStream.schema(in.schema).parquet(dir),
      "k", "tus", "event_id", minGap = 60000000L)
    val q = out.toDF().writeStream.format("memory").queryName("parity_debounce")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT id, prev_gap, is_kept FROM parity_debounce")
      .collect().map(r => r.getLong(0) -> (optLong(r, 1), r.getBoolean(2))).toMap
    val exp = SparkEntry.queries("q_debounce")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("event_id") ->
        (optLong(r, r.fieldIndex("prev_gap")), r.getAs[Boolean]("is_kept"))).toMap
    assert(got == exp)
    // sf0.001 gaps all clear 60s, so suppression is pinned by the
    // synthetic cross-batch test below; here: first-event NULLs and
    // real gaps both present
    assert(exp.size >= 1000)
    assert(exp.values.exists(_._1 == Long.MinValue) &&
      exp.values.exists(_._1 != Long.MinValue))
  }

  test("debounceStream suppresses across micro-batches off one long of state") {
    val dir = Files.createTempDirectory("debounce-batches").toString
    val ckpt = Files.createTempDirectory("debounce-ckpt").toString
    val outDir = Files.createTempDirectory("debounce-out").toString
    import spark.implicits._
    def run(): Map[Long, (Long, Boolean)] = {
      val in = spark.readStream
        .schema("k LONG, t LONG, id LONG").parquet(s"$dir/log")
      val q = StreamingPipeline.debounceStream(in, "k", "t", "id", minGap = 60L)
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("t"), r.getAs[Boolean]("is_kept"))).toMap
    }
    // batch 1: both kept (first event, then gap 60 = minGap)
    Seq((1L, 40L, 1L), (1L, 100L, 2L)).toDF("k", "t", "id")
      .write.mode("overwrite").parquet(s"$dir/log")
    assert(run() == Map(1L -> (40L, true), 2L -> (100L, true)))
    // batch 2 opens inside the carried gap: 105 gaps 5 against the
    // checkpointed last-seen 100 -> dropped; LAG semantics means the
    // DROPPED 105 still updates last-seen, so 130 gaps 25 -> dropped,
    // and 170 gaps 40 against 130 -> dropped (a chained rate-limiter
    // would have kept 170 against last-KEPT 100)
    Seq((1L, 105L, 3L), (1L, 130L, 4L), (1L, 170L, 5L))
      .toDF("k", "t", "id").write.mode("append").parquet(s"$dir/log")
    val all = run()
    assert(all.view.filterKeys(Set(3L, 4L, 5L)).toMap ==
      Map(3L -> (105L, false), 4L -> (130L, false), 5L -> (170L, false)))
  }

  test("psiWindowed replays the oracled q_psi total (sf0.001)") {
    // fit = the batch query's exact reference side (view vc deciles);
    // the oracled per-bucket report's ref_n is the refCounts vector, so
    // a single all-containing window must reproduce sum(psi_unats)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("vc"))
    val refSide = ev.where(col("event_type") === "view").select("vc")
    val bounds = graft.pipeline.Stats.quantileBounds(refSide, "vc", 10)
    val batch = SparkEntry.queries("q_psi")(spark, sfDir).collect()
    val refCounts = Array.fill(10)(0L)
    batch.foreach(r => refCounts(r.getInt(0)) = r.getLong(1))
    val expPsi = batch.map(_.getAs[Long]("psi_unats")).sum
    val expN = batch.map(_.getAs[Long]("cur_n")).sum

    val cur = ev.where(col("event_type") === "click")
      .select(to_timestamp(lit("2026-01-01 00:00:00")).as("ts"), col("vc"))
    val dir = Files.createTempDirectory("parity-psi").toString
    cur.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.psiWindowed(
      spark.readStream.schema(cur.schema).parquet(dir),
      "ts", "vc", bounds, refCounts, "1 day")
    val q = out.writeStream.format("memory").queryName("parity_psi")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT n_events, psi_unats FROM parity_psi").collect()
    assert(got.length == 1)
    assert(got.head.getLong(0) == expN)
    assert(got.head.getLong(1) == expPsi)
  }

  test("firstSeenStream replays the oracled q_growth_curve new_ids (sf0.001)") {
    // the batch query's exact input: per (event_type, user) first day;
    // the composite key packs the type code into the id (cusum trick)
    val ev = eventsTus.select(col("user_id"), col("event_type"),
      expr("tus div 86400000000").as("day"))
    val types = ev.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.zipWithIndex.toMap
    val code = typedLit(types)
    val in = ev.select(
      (col("user_id") * 16 + code(col("event_type"))).cast("long").as("id"),
      col("day"))
    val dir = Files.createTempDirectory("parity-firstseen").toString
    in.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.firstSeenStream(
      spark.readStream.schema(in.schema).parquet(dir), "id", "day")
    val q = out.toDF().writeStream.format("memory").queryName("parity_fs")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // per-(type, first day) counts of the emitted rows == new_ids
    val got = spark.sql("SELECT id, first_bucket FROM parity_fs").collect()
      .groupBy(r => (r.getLong(0) % 16, r.getLong(1)))
      .map { case (k, rs) => k -> rs.length.toLong }
    val exp = SparkEntry.queries("q_growth_curve")(spark, sfDir)
      .collect().map(r => (types(r.getString(0)).toLong, r.getLong(1)) ->
        r.getLong(2)).toMap
    assert(got == exp)
    assert(exp.size > 20) // non-trivial
  }

  test("firstSeenStream latches: an id never re-emits across runs") {
    val dir = Files.createTempDirectory("stream-fs").toString
    val ckpt = Files.createTempDirectory("stream-fs-ckpt").toString
    val outDir = Files.createTempDirectory("stream-fs-out").toString
    val schema = Seq((1L, 1L)).toDF("id", "day").schema
    def run(): Set[(Long, Long)] = {
      val out = StreamingPipeline.firstSeenStream(
        spark.readStream.schema(schema).parquet(s"$dir/log"), "id", "day")
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // run 1: id 7 seen on days 5 and 3 in one batch -> min wins
    Seq((7L, 5L), (7L, 3L)).toDF("id", "day")
      .write.mode("overwrite").parquet(s"$dir/log")
    assert(run() == Set((7L, 3L)))
    // run 2: id 7 again (even with an EARLIER day) never re-emits;
    // id 8 is new and emits
    Seq((7L, 1L), (8L, 6L)).toDF("id", "day")
      .write.mode("append").parquet(s"$dir/log")
    assert(run() == Set((7L, 3L), (8L, 6L)))
  }

  test("scd2Stream replays the oracled q_scd2 closed rows (sf0.001)") {
    // the batch query's exact input: purchase events keyed by user
    val in = eventsTus.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        expr("cast(round(value * 100) as bigint)").as("vc"), col("tus"))
    val dir = Files.createTempDirectory("parity-scd2").toString
    in.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.scd2Stream(
      spark.readStream.schema(in.schema).parquet(dir),
      "user_id", "tus", "event_id", "vc")
    val q = out.toDF().writeStream.format("memory").queryName("parity_scd2")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      "SELECT key, id, value, valid_from_us, valid_to_us FROM parity_scd2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2).toLong,
        r.getLong(3), r.getLong(4))).toSet
    // stream emits CLOSED versions only; the oracled batch rows with a
    // non-null valid_to are exactly those
    val exp = SparkEntry.queries("q_scd2")(spark, sfDir)
      .where(col("valid_to_us").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == exp)
    assert(exp.size > 50) // non-trivial
  }

  test("dedupAgainstBloom replays the oracled q_bloom_dedup misses (sf0.001)") {
    // same reference corpus + bitset as the batch query (docs id%3=0)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bits = graft.pipeline.BloomDedup.bloomBits(
      docs.where(col("doc_id") % 3 === 0), "text", numBits = 16384, k = 4)
    val in = docs.select("doc_id", "text")
    val dir = Files.createTempDirectory("parity-bloom").toString
    in.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.dedupAgainstBloom(
      spark.readStream.schema(in.schema).parquet(dir), "text", bits, k = 4)
    val q = out.writeStream.format("memory").queryName("parity_bloom")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT doc_id FROM parity_bloom")
      .collect().map(_.getLong(0)).toSet
    // the stream passes exactly the rows the oracled batch query marks
    // bloom_hit = false (same fingerprint, same bitset, same k)
    val batch = SparkEntry.queries("q_bloom_dedup")(spark, sfDir).collect()
    val exp = batch.filter(!_.getBoolean(1)).map(_.getLong(0)).toSet
    assert(got == exp)
    // non-trivial both ways: some pass, some are dropped
    assert(exp.nonEmpty && exp.size < batch.length)
  }

  test("distinctWindowed replays the batch HLL estimate per window (sf0.001)") {
    // watermarks attach only to TIMESTAMP (not NTZ); session TZ is UTC
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
    val exp = ev.groupBy(window(col("ts"), "1 day"))
      .agg(graft.pipeline.Hll.sketch(col("user_id"), 64).as("sk"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"),
        graft.pipeline.Hll.estimate(col("sk"), 64).as("est"))
      .collect().map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    val dir = Files.createTempDirectory("parity-distinct").toString
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.distinctWindowed(
      spark.readStream.schema(ev.schema).parquet(dir), "ts", "user_id", "1 day")
    val q = out.writeStream.format("memory").queryName("parity_distinct")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      "SELECT window_start, n_events, n_distinct_est FROM parity_distinct")
      .collect().map(r => r.get(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp)
    assert(exp.size > 10 && exp.values.exists(_._2 > 1)) // non-trivial
  }

  test("gapRegularityStream replays the oracled q_gap_regularity rows (sf0.001)") {
    val in = eventsTus.select(col("user_id"), col("tus"))
    val dir = Files.createTempDirectory("parity-gapreg").toString
    in.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.gapRegularityStream(
      spark.readStream.schema(in.schema).parquet(dir),
      "user_id", "tus", divisor = 1000000L, kNum = 1, kDen = 10, minGaps = 5)
    val q = out.toDF().writeStream.format("memory").queryName("parity_gapreg")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      "SELECT key, nGaps, gapSum, gapSsq, varN2, isRobotic FROM parity_gapreg")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val exp = SparkEntry.queries("q_gap_regularity")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(got == exp)
    assert(exp.size > 10) // non-trivial key spread (sf0.001 has 15 users)
  }

  test("gapRegularityStream carries the four-long state across micro-batches") {
    val dir = Files.createTempDirectory("stream-gapreg2").toString
    val ckpt = Files.createTempDirectory("stream-gapreg2-ckpt").toString
    val outDir = Files.createTempDirectory("stream-gapreg2-out").toString
    // metronome at 10s cadence, fed in two halves: the second run must
    // see the first half's last timestamp (the cross-batch gap is the
    // same 10s, not a fresh first-event null)
    val part1 = (0 until 4).map(i => (1L, i * 10000000L))
    val part2 = (4 until 8).map(i => (1L, i * 10000000L))
    val schema = part1.toDF("k", "tus").schema
    part1.toDF("k", "tus").write.mode("overwrite").parquet(dir)
    def run(): Map[Long, (Long, Long, Boolean)] = {
      val out = StreamingPipeline.gapRegularityStream(
        spark.readStream.schema(schema).parquet(dir),
        "k", "tus", divisor = 1000000L, kNum = 1, kDen = 10, minGaps = 5)
      val q = out.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).collect()
        .map(r => r.getAs[Long]("nGaps") ->
          ((r.getAs[Long]("gapSum"), r.getAs[Long]("varN2"),
            r.getAs[Boolean]("isRobotic")))).toMap
    }
    val first = run()
    assert(first == Map(3L -> ((30L, 0L, false)))) // 3 gaps < minGaps
    part2.toDF("k", "tus").write.mode("append").parquet(dir)
    val second = run()
    // 7 gaps of exactly 10: the 4->5 boundary gap came from state
    assert(second(3L) == ((30L, 0L, false)))
    assert(second(7L) == ((70L, 0L, true))) // metronome flags past minGaps
  }

  test("termCountsWindowed: streaming complete-mode equals the batch call (sf0.001)") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("ts").cast("timestamp").as("ts"),
        concat(col("event_type"), lit(" k"),
          (get_json_object(col("props"), "$.k").cast("int") % 20)
            .cast("string")).as("text"))
    val exp = StreamingPipeline.termCountsWindowed(ev, "ts", "text", "7 days")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    val dir = Files.createTempDirectory("parity-terms").toString
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.termCountsWindowed(
      spark.readStream.schema(ev.schema).parquet(dir), "ts", "text", "7 days")
    val q = out.writeStream.format("memory").queryName("parity_terms")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT window_start, term, cnt FROM parity_terms")
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(got == exp)
    assert(exp.size > 20) // several windows x terms
  }

  test("trendingTopKStream: update-mode top-3 equals the batch cut (sf0.001)") {
    val weekUs = 604800000000L
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("ts").cast("timestamp").as("ts"),
        concat_ws(" ", col("event_type"), concat(lit("k"),
          (get_json_object(col("props"), "$.k").cast("int") % 20)
            .cast("string"))).as("text"))
    // batch expectation: exact window counts + (cnt DESC, term ASC) top-3
    val counts = StreamingPipeline.termCountsWindowed(ev, "ts", "text", "7 days")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("window_start").orderBy(desc("cnt"), col("term"))
    val exp = counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(unix_micros(col("window_start")).as("w"), col("term"),
        col("cnt"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        ((r.getString(1), r.getLong(2)))).toMap
    val dir = Files.createTempDirectory("trend-topk").toString
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    // capacity 4096 >= distinct terms at sf0.001 -> Misra-Gries is exact
    val out = StreamingPipeline.trendingTopKStream(
      spark.readStream.schema(ev.schema).parquet(dir),
      "ts", "text", weekUs, k = 3, capacity = 4096)
    val q = out.toDF().writeStream.format("memory").queryName("trend_topk")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql(
      "SELECT window_start, term, cnt, rank FROM trend_topk")
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got == exp, s"got=${got.toSeq.sortBy(_._1)} exp=${exp.toSeq.sortBy(_._1)}")
    assert(exp.size >= 6) // at least 2 windows x 3 ranks

    // bounded state: capacity enforced — with capacity k the sketch still
    // yields k rows per window and every count is <= the true count
    val small = StreamingPipeline.trendingTopKStream(
      spark.readStream.schema(ev.schema).parquet(dir),
      "ts", "text", weekUs, k = 3, capacity = 3)
    val q2 = small.toDF().writeStream.format("memory").queryName("trend_small")
      .outputMode(OutputMode.Update()).trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    val trueCounts = counts
      .select(unix_micros(col("window_start")), col("term"), col("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val smallRows = spark.sql(
      "SELECT window_start, term, cnt FROM trend_small").collect()
    assert(smallRows.nonEmpty)
    for (r <- smallRows) {
      val t = trueCounts.getOrElse((r.getLong(0), r.getString(1)), 0L)
      assert(r.getLong(2) <= t,
        s"MG count ${r.getLong(2)} exceeds true count $t for ${r.getString(1)}")
    }
  }

  test("trendingTopKStream: event-time timeout evicts closed-window state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val weekUs = 604800000000L
    val mem = MemoryStream[(Timestamp, String)]
    val out = StreamingPipeline.trendingTopKStream(
      mem.toDF().toDF("ts", "text"), "ts", "text", weekUs, k = 2,
      capacity = 16)
    val q = out.toDF().writeStream.format("memory").queryName("trend_evict")
      .outputMode(OutputMode.Update()).start()
    def ts(us: Long) = new Timestamp(us / 1000L)
    try {
      // ts strictly above 0: the very first micro-batch's watermark is
      // 0 ms and Spark's late filter drops rows AT the watermark
      mem.addData((ts(5000000L), "a a b")); q.processAllAvailable()
      // window 0 is open: one state row
      mem.addData((ts(3L * weekUs), "c")); q.processAllAvailable()
      // the batch above raised the watermark to 3 weeks; this batch
      // fires window 0's timeout (close = 1 week << watermark) and the
      // eviction emits nothing
      mem.addData((ts(3L * weekUs + 1000000L), "c d")); q.processAllAvailable()
      val rowsTotal = q.lastProgress.stateOperators(0).numRowsTotal
      assert(rowsTotal == 1L,
        s"closed-window state must be evicted, still holding $rowsTotal rows")
      // the evicted window's final ranking was already emitted and
      // nothing retracts it
      val w0 = spark.sql(
        "SELECT term, cnt FROM trend_evict WHERE window_start = 0 AND rank = 1")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(w0 == Set(("a", 2L)))
    } finally q.stop()
  }

  test("e2e streaming curation: clean -> exact dedup -> bloom gate -> windowed counts in ONE query") {
    // the full ingest skeleton as one streaming plan: stateless
    // normalization, watermark-bounded exact dedup
    // (dropDuplicatesWithinWatermark), the static-reference Bloom
    // anti-gate (stateless broadcast-bitset probe), then a windowed
    // term-count aggregation — TWO chained stateful operators (dedup ->
    // time-window agg), the multi-stateful shape Spark supports in
    // append mode. The trending top-k face stays a separate query by
    // design (rank-over-agg needs update mode — see trendingTopKStream).
    val dir = Files.createTempDirectory("stream-e2e").toString
    val ref = Seq((100L, "ref doc one")).toDF("doc_id", "text")
    val bits = graft.pipeline.BloomDedup.bloomBits(ref, "text", 16384, 4)
    val rows = Seq(
      (1L, "  Fresh   Alpha Beta ", Timestamp.valueOf("2026-01-01 00:00:10")),
      (2L, "fresh alpha beta", Timestamp.valueOf("2026-01-01 00:00:20")), // exact dup post-clean
      (3L, "ref doc one", Timestamp.valueOf("2026-01-01 00:00:30")),     // reference-corpus dup
      (4L, "gamma delta", Timestamp.valueOf("2026-01-01 00:00:40")),
      // pushes the watermark past window [00:00, 00:01) so append mode
      // finalizes it; its own window stays open and unemitted
      (5L, "omega", Timestamp.valueOf("2026-01-01 00:02:30")))
    val df = rows.toDF("doc_id", "text", "ts")
    df.write.mode("overwrite").parquet(dir)

    val cleaned = spark.readStream.schema(df.schema).parquet(dir)
      .withColumn("clean", graft.pipeline.TextNorm.clean(col("text")))
    val deduped = StreamingPipeline.dedupExact(cleaned, "clean", "ts", "1 minute")
    val gated = StreamingPipeline.dedupAgainstBloom(deduped, "clean", bits, 4)
    // watermarkDelay = null: inherit dedupExact's watermark (Spark
    // disallows redefining it in a multi-stateful chain)
    val counts = StreamingPipeline.termCountsWindowed(gated, "ts", "clean",
      "1 minute", watermarkDelay = null)
    val q = counts.writeStream.format("memory").queryName("e2e_curation")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql(
      "SELECT term, cnt FROM e2e_curation WHERE window_start = timestamp'2026-01-01 00:00:00'")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // doc 2 fell to the exact dedup, doc 3 to the Bloom gate: each
    // surviving term counts exactly once
    assert(out == Set(("fresh", 1L), ("alpha", 1L), ("beta", 1L),
      ("gamma", 1L), ("delta", 1L)), out.mkString(","))
  }

  test("ngramNoveltyStream single batch rolls up to the batch ngramNovelty (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("ts", lit(Timestamp.valueOf("2026-01-01 00:00:00")))
    val streamRows = StreamingPipeline.ngramNoveltyStream(
      docs, "doc_id", "text", "ts", n = 3)
    val got = StreamingPipeline.ngramNoveltyRollup(streamRows)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = graft.pipeline.Stats.ngramNovelty(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", n = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == exp.length && got.sameElements(exp),
      s"stream rollup diverged from batch: got ${got.take(3).toSeq} vs ${exp.take(3).toSeq}")
  }

  test("ngramNoveltyStream: TTL evicts gram state; re-sight is novel again") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hourUs = 3600000000L
    def ts(us: Long) = new Timestamp(us / 1000L)
    val mem = MemoryStream[(Long, String, Timestamp)]
    val out = StreamingPipeline.ngramNoveltyStream(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      n = 2, ttlMicros = hourUs)
    val q = out.toDF().writeStream.format("memory").queryName("nov_evict")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: doc 1 originates "a b" (ts strictly above 0 — the
      // first micro-batch's watermark is 0 ms and rows AT it drop)
      mem.addData((1L, "a b", ts(5000000L))); q.processAllAvailable()
      // batch 2: doc 2 repeats the gram within the TTL — not novel
      mem.addData((2L, "a b", ts(10000000L))); q.processAllAvailable()
      // batch 3: a filler gram 3h out raises the max event time; the
      // watermark (one batch behind) is still 10s here, so nothing
      // evicts yet
      mem.addData((3L, "x y", ts(3L * hourUs))); q.processAllAvailable()
      // batch 4: watermark is now 3h >> "a b"'s last_seen + 1h, and
      // the "a b" group has NO data this batch (event-time timeouts
      // only fire for data-less groups) — the eviction runs here
      mem.addData((4L, "m n", ts(3L * hourUs + 1000000L))); q.processAllAvailable()
      // batch 5: "a b" re-arrives after eviction — novel AGAIN
      mem.addData((5L, "a b", ts(3L * hourUs + 5000000L))); q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, gram, novel FROM nov_evict")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
      assert(rows.contains((1L, "a b", true)), s"doc 1 must originate: $rows")
      assert(rows.contains((2L, "a b", false)), s"doc 2 within TTL must not: $rows")
      assert(rows.contains((5L, "a b", true)),
        s"doc 5 after TTL eviction must re-originate: $rows")
      // state holds only the still-live grams ("x y", "m n", and the
      // re-seen "a b"), not every gram ever seen
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      assert(stateRows == 3L, s"TTL must bound state, holding $stateRows rows")
    } finally q.stop()
  }

  test("ngramNoveltyStream state carries across runs via checkpoint") {
    val dir = Files.createTempDirectory("stream-nov").toString
    val ckpt = Files.createTempDirectory("stream-nov-ckpt").toString
    val outDir = Files.createTempDirectory("stream-nov-out").toString
    val schema = Seq((1L, "x", Timestamp.valueOf("2026-01-01 00:00:00")))
      .toDF("doc_id", "text", "ts").schema

    def run(): Set[(Long, String, Boolean)] = {
      // file sink + checkpoint: the memory sink cannot recover state
      val rows = StreamingPipeline.ngramNoveltyStream(
        spark.readStream.schema(schema).parquet(dir),
        "doc_id", "text", "ts", n = 2, ttlMicros = 86400000000L)
      val q = rows.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      spark.read.parquet(outDir).select("doc_id", "gram", "novel")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    }

    // run 1: doc 1 originates both grams
    Seq((1L, "p q r", Timestamp.valueOf("2026-01-01 00:00:10")))
      .toDF("doc_id", "text", "ts").write.mode("overwrite").parquet(dir)
    assert(run() == Set((1L, "p q", true), (1L, "q r", true)))

    // run 2 (new JVM-level query, same checkpoint): doc 2 repeats one
    // gram — the restored state marks it seen; the fresh gram is novel
    Seq((2L, "q r s", Timestamp.valueOf("2026-01-01 00:10:00")))
      .toDF("doc_id", "text", "ts").write.mode("append").parquet(dir)
    assert(run() == Set((1L, "p q", true), (1L, "q r", true),
      (2L, "q r", false), (2L, "r s", true)))
  }
  test("driftStream single batch equals the batch distributionDistance") {
    val dir = Files.createTempDirectory("stream-drift").toString
    val rnd = new scala.util.Random(13)
    // reference: values 0..19 roughly uniform; stream: shifted right
    val ref = (0 until 400).map(i => Tuple1((rnd.nextInt(20)).toLong))
      .toDF("v")
    val refHist = ref.groupBy("v").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val cur = (0 until 300).map(i => (1L, (5 + rnd.nextInt(20)).toLong))
    val curDf = cur.toDF("k", "v")
    curDf.write.mode("overwrite").parquet(dir)
    val out = StreamingPipeline.driftStream(
      spark.readStream.schema(curDf.schema).parquet(dir),
      "k", "v", refHist)
    val q = out.toDF().writeStream.format("memory").queryName("drift_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.sql(
      "SELECT nCur, w1Micro, tvPpm, cvmMicro FROM drift_stream")
      .collect()(0)
    val batch = graft.pipeline.Stats.distributionDistance(
      ref, curDf.select("v"), "v").collect()(0)
    assert(got.getLong(0) == batch.getLong(1))
    assert(got.getLong(1) == batch.getLong(2), "w1 parity")
    assert(got.getLong(2) == batch.getLong(3), "tv parity")
    assert(got.getLong(3) == batch.getLong(4), "cvm parity")
    assert(got.getLong(1) > 0L) // the shift is visible
  }

  test("driftStream accumulates state across batches and caps bins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val out = StreamingPipeline.driftStream(
      mem.toDF().toDF("k", "v"), "k", "v",
      refHist = Seq((0L, 1L), (10L, 1L)), maxBins = 8)
    val q = out.toDF().writeStream.format("memory").queryName("drift_acc")
      .outputMode("append").start()
    try {
      // batch 1: cur {10, 20} vs ref {0, 10} — the hand case: W1 = 10
      mem.addData((1L, 10L), (1L, 20L)); q.processAllAvailable()
      val b1 = spark.sql(
        "SELECT w1Micro, tvPpm, cvmMicro FROM drift_acc").collect()(0)
      assert(b1.getLong(0) == 10000000L && b1.getLong(1) == 500000L &&
        b1.getLong(2) == 187500L)
      // batch 2: two more rows at 0 and 10 — the CUMULATIVE histogram
      // {0:1, 10:2, 20:1} must be scored, not the increment alone
      mem.addData((1L, 0L), (1L, 10L)); q.processAllAvailable()
      val rows = spark.sql(
        "SELECT nCur, w1Micro FROM drift_acc ORDER BY nCur").collect()
      assert(rows.length == 2 && rows(1).getLong(0) == 4L)
      val batch2 = graft.pipeline.Stats.distributionDistance(
        Seq(0L, 10L).toDF("v"), Seq(10L, 20L, 0L, 10L).toDF("v"), "v")
        .collect()(0)
      assert(rows(1).getLong(1) == batch2.getLong(2))
    } finally q.stop()
  }

  test("calibrationStream single batch equals the batch calibrationReport") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Boolean)]
    val out = StreamingPipeline.calibrationStream(
      mem.toDF().toDF("k", "p", "y"), "k", "p", "y", bins = 2)
    val q = out.toDF().writeStream.format("memory").queryName("cal_stream")
      .outputMode("append").start()
    try {
      // the wave-46 hand case: bin0 gap 600000 (n=2), bin1 gap 200000
      mem.addData((1L, 200000L, true), (1L, 200000L, false),
        (1L, 900000L, true), (1L, 900000L, true))
      q.processAllAvailable()
      val r = spark.sql("SELECT * FROM cal_stream").collect()(0)
      assert(r.getLong(1) == 4L && r.getLong(2) == 200000L)
      assert(r.getInt(3) == 0 && r.getLong(4) == 300000L)
      val batch = graft.pipeline.Stats.calibrationReport(
        Seq((200000L, true), (200000L, false), (900000L, true),
          (900000L, true)).toDF("p", "y"), "p", "y", bins = 2)
        .collect()(0)
      assert(r.getLong(2) == batch.getLong(6), "ECE parity with the batch face")
      // batch 2: two more perfect bin-1 rows — the CUMULATIVE state is
      // re-scored (gaps 600000 + 200000 over n=6)
      mem.addData((1L, 950000L, true), (1L, 850000L, true))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM cal_stream ORDER BY nTotal")
        .collect()
      assert(rows.length == 2 && rows(1).getLong(1) == 6L)
      // conf_sum(bin1) = 3600000, pos = 4 -> gap 400000; ece = 1e6/6
      assert(rows(1).getLong(2) == (600000L + 400000L) / 6L)
    } finally q.stop()
  }

  test("calibrationStream rejects p_micro outside [0, 1e6] with a " +
      "named diagnosis, not an array fault") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Boolean)]
    val out = StreamingPipeline.calibrationStream(
      mem.toDF().toDF("k", "p", "y"), "k", "p", "y", bins = 2)
    val q = out.toDF().writeStream.format("memory").queryName("cal_guard")
      .outputMode("append").start()
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        messages(e.getCause))
    try {
      mem.addData((1L, -5L, true))
      val ex = intercept[Exception] { q.processAllAvailable() }
      assert(messages(ex).exists(m => m.contains("calibration_stream") &&
        m.contains("p_micro=-5")), messages(ex).mkString("; "))
    } finally q.stop()
  }

  test("driftStream per-key histogram recovers across runs via checkpoint") {
    // the sprtStream recovery discipline for the drift monitor: run 1
    // ends (query killed), run 2 restarts from the SAME checkpoint on
    // new data — the restored cumulative histogram must score the
    // union exactly as an uninterrupted run would (three-statistic
    // parity with the batch operator on the cumulative data)
    val dir = Files.createTempDirectory("stream-drift-ck").toString
    val ckpt = Files.createTempDirectory("stream-drift-ck-ckpt").toString
    val outDir = Files.createTempDirectory("stream-drift-ck-out").toString
    val refHist = Seq((0L, 1L), (10L, 1L))
    val schema = Seq((1L, 1L)).toDF("k", "v").schema

    def run(): Unit = {
      // file sink + checkpoint: the memory sink cannot recover state
      val rows = StreamingPipeline.driftStream(
        spark.readStream.schema(schema).parquet(dir), "k", "v",
        refHist, maxBins = 8)
      val q = rows.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    // run 1: key 1 sees {10, 20}, then the query terminates
    Seq((1L, 10L), (1L, 20L)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    run()
    // run 2 (new query, same checkpoint): {0, 10} more — the restored
    // histogram {10:1, 20:1} must accumulate to {0:1, 10:2, 20:1}
    Seq((1L, 0L), (1L, 10L)).toDF("k", "v")
      .write.mode("append").parquet(dir)
    run()

    val out = spark.read.parquet(outDir)
      .select("nCur", "w1Micro", "tvPpm", "cvmMicro")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(2L, 4L))
    def batchOf(cur: Seq[Long]) = {
      val b = graft.pipeline.Stats.distributionDistance(
        Seq(0L, 10L).toDF("v"), cur.toDF("v"), "v").collect()(0)
      (b.getLong(2), b.getLong(3), b.getLong(4))
    }
    assert(out(2L) == batchOf(Seq(10L, 20L)), "run-1 emission parity")
    assert(out(4L) == batchOf(Seq(10L, 20L, 0L, 10L)),
      "post-recovery emission must equal the uninterrupted cumulative run")
  }

  test("calibrationStream per-key state recovers across runs via " +
      "checkpoint") {
    // the driftStream recovery discipline for its sibling monitor:
    // run 1 ends (query killed), run 2 restarts from the SAME
    // checkpoint on new rows — the restored 3·bins-long state must
    // re-score the cumulative data exactly as the batch
    // calibrationReport on the union would
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-cal-ck").toString
    val ckpt = Files.createTempDirectory("stream-cal-ck-ckpt").toString
    val outDir = Files.createTempDirectory("stream-cal-ck-out").toString
    val schema = Seq((1L, 1L, true)).toDF("k", "p", "y").schema

    def run(): Unit = {
      val rows = StreamingPipeline.calibrationStream(
        spark.readStream.schema(schema).parquet(dir), "k", "p", "y",
        bins = 2)
      val q = rows.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    // run 1: the wave-46 hand case (ECE = 200000 over n=4)
    val b1 = Seq((1L, 200000L, true), (1L, 200000L, false),
      (1L, 900000L, true), (1L, 900000L, true))
    b1.toDF("k", "p", "y").write.mode("overwrite").parquet(dir)
    run()
    // run 2 (new query, same checkpoint): two more bin-1 rows — the
    // restored per-bin triples must accumulate, not restart at zero
    val b2 = Seq((1L, 950000L, true), (1L, 850000L, true))
    b2.toDF("k", "p", "y").write.mode("append").parquet(dir)
    run()

    val out = spark.read.parquet(outDir)
      .select("nTotal", "eceMicro", "worstBin", "worstGapMicro")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getInt(2), r.getLong(3)))).toMap
    assert(out.keySet == Set(4L, 6L), out.toString)
    assert(out(4L)._1 == 200000L, "run-1 emission parity")
    // cumulative: gaps 600000 (bin0, n=2) + 400000 (bin1, n=4)
    val batch = graft.pipeline.Stats.calibrationReport(
      (b1 ++ b2).map(t => (t._2, t._3)).toDF("p", "y"), "p", "y",
      bins = 2).collect()(0)
    assert(out(6L)._1 == batch.getLong(6),
      "post-recovery ECE must equal the batch face on the union")
    assert(out(6L)._2 == 0 && out(6L)._3 == 300000L,
      "worst bin is bin0 at 600000/2 per-row gap")
  }

  test("pageHinkleyStream single batch matches the batch pageHinkley " +
      "final row") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val out = StreamingPipeline.pageHinkleyStream(
      mem.toDF().toDF("k", "t", "x"), "k", "t", "x",
      lambdaMicro = 4000000L)
    val q = out.toDF().writeStream.format("memory").queryName("ph_one")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L),
        (1L, 4L, 20L), (1L, 5L, 20L))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT nSoFar, phMicro, alarm FROM ph_one ORDER BY nSoFar DESC")
        .collect()(0)
      val batch = graft.pipeline.Stats.pageHinkley(
        Seq((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L), (1L, 4L, 20L),
          (1L, 5L, 20L)).toDF("k", "t", "x"), Seq("k"), "t", "x",
        lambdaMicro = 4000000L).collect()(0)
      assert(last.getLong(0) == batch.getLong(1))
      assert(last.getLong(1) == batch.getLong(3), "PH parity")
      assert(last.getBoolean(2) == batch.getBoolean(4))
    } finally q.stop()
  }

  test("pageHinkleyStream accumulates the running mean across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val out = StreamingPipeline.pageHinkleyStream(
      mem.toDF().toDF("k", "t", "x"), "k", "t", "x",
      lambdaMicro = 4000000L)
    val q = out.toDF().writeStream.format("memory").queryName("ph_acc")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L))
      q.processAllAvailable()
      mem.addData((1L, 4L, 20L), (1L, 5L, 20L))
      q.processAllAvailable()
      val last = spark.sql(
        "SELECT nSoFar, phMicro, alarm FROM ph_acc ORDER BY nSoFar DESC")
        .collect()(0)
      // cumulative prefix, not batch-local: same hand case, PH 13.5e6
      assert(last.getLong(0) == 5L && last.getLong(1) == 13500000L &&
        last.getBoolean(2))
    } finally q.stop()
  }

  test("pageHinkleyStream 4-long state recovers across runs via " +
      "checkpoint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-ph-ck").toString
    val ckpt = Files.createTempDirectory("stream-ph-ck-ckpt").toString
    val outDir = Files.createTempDirectory("stream-ph-ck-out").toString
    val schema = Seq((1L, 1L, 1L)).toDF("k", "t", "x").schema

    def run(): Unit = {
      val rows = StreamingPipeline.pageHinkleyStream(
        spark.readStream.schema(schema).parquet(dir), "k", "t", "x",
        lambdaMicro = 4000000L)
      val q = rows.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    val b1 = Seq((1L, 1L, 10L), (1L, 2L, 10L), (1L, 3L, 10L))
    b1.toDF("k", "t", "x").write.mode("overwrite").parquet(dir)
    run()
    val b2 = Seq((1L, 4L, 20L), (1L, 5L, 20L))
    b2.toDF("k", "t", "x").write.mode("append").parquet(dir)
    run()

    val out = spark.read.parquet(outDir)
      .select("nSoFar", "phMicro", "alarm").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L), out.toString)
    assert(out(3L) == ((0L, false)), "run-1 steady prefix")
    // restored (n, s, m, minM) must continue the run-1 prefix: the
    // level shift scores against the CUMULATIVE mean
    assert(out(5L) == ((13500000L, true)),
      "post-recovery PH must equal the batch face on the union")
  }

  test("reservoirStream equals the batch prioritySamplePerKey on any " +
      "prefix, accumulates across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val out = StreamingPipeline.reservoirStream(
      mem.toDF().toDF("k", "id"), "k", "id", k = 3)
    val q = out.toDF().writeStream.format("memory").queryName("res_acc")
      .outputMode("append").start()
    try {
      mem.addData((1L to 10L).map((1L, _)): _*); q.processAllAvailable()
      mem.addData((11L to 20L).map((1L, _)): _*); q.processAllAvailable()
      val last = spark.sql(
        "SELECT id FROM res_acc WHERE nSeen = 20 ORDER BY priority")
        .collect().map(_.getLong(0)).toSeq
      val batch = graft.pipeline.Splits.prioritySamplePerKey(
        (1L to 20L).map((1L, _)).toDF("k", "id"), Seq("k"), "id", k = 3)
        .orderBy("priority").collect().map(_.getLong(1)).toSeq
      assert(last == batch, s"stream $last != batch $batch")
      // prefix property: the batch-1 emission equals batch over 1..10
      val first = spark.sql(
        "SELECT id FROM res_acc WHERE nSeen = 10 ORDER BY priority")
        .collect().map(_.getLong(0)).toSeq
      val batch10 = graft.pipeline.Splits.prioritySamplePerKey(
        (1L to 10L).map((1L, _)).toDF("k", "id"), Seq("k"), "id", k = 3)
        .orderBy("priority").collect().map(_.getLong(1)).toSeq
      assert(first == batch10)
    } finally q.stop()
  }

  test("reservoirStream k-pair state recovers across runs via " +
      "checkpoint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream-res-ck").toString
    val ckpt = Files.createTempDirectory("stream-res-ck-ckpt").toString
    val outDir = Files.createTempDirectory("stream-res-ck-out").toString
    val schema = Seq((1L, 1L)).toDF("k", "id").schema

    def run(): Unit = {
      val rows = StreamingPipeline.reservoirStream(
        spark.readStream.schema(schema).parquet(dir), "k", "id", k = 3)
      val q = rows.toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }

    (1L to 10L).map((1L, _)).toDF("k", "id")
      .write.mode("overwrite").parquet(dir)
    run()
    (11L to 20L).map((1L, _)).toDF("k", "id")
      .write.mode("append").parquet(dir)
    run()

    val last = spark.read.parquet(outDir).where($"nSeen" === 20)
      .orderBy("priority").collect().map(_.getLong(1)).toSeq
    val batch = graft.pipeline.Splits.prioritySamplePerKey(
      (1L to 20L).map((1L, _)).toDF("k", "id"), Seq("k"), "id", k = 3)
      .orderBy("priority").collect().map(_.getLong(1)).toSeq
    assert(last == batch,
      "post-recovery sample must equal the batch face on the union")
  }

  test("quantileStream single batch equals percentileReport; " +
      "cumulative across batches; bin cap fails loud") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val out = StreamingPipeline.quantileStream(
      mem.toDF().toDF("k", "v"), "k", "v", maxBins = 16)
    val q = out.toDF().writeStream.format("memory").queryName("qt_acc")
      .outputMode("append").start()
    try {
      mem.addData((1L to 10L).map(v => (1L, v)): _*)
      q.processAllAvailable()
      val r1 = spark.sql("SELECT * FROM qt_acc").collect()(0)
      val batch = graft.pipeline.Stats.percentileReport(
        (1L to 10L).map(v => (1L, v)).toDF("k", "v"), Seq("k"), "v")
        .collect()(0)
      assert((r1.getLong(1), r1.getLong(2), r1.getLong(3),
        r1.getLong(4)) == ((batch.getLong(1), batch.getLong(2),
        batch.getLong(3), batch.getLong(4))), "batch-face parity")
      // batch 2: shift mass upward — quantiles re-score cumulatively
      mem.addData(Seq.fill(10)((1L, 9L)): _*)
      q.processAllAvailable()
      val r2 = spark.sql("SELECT * FROM qt_acc ORDER BY n DESC")
        .collect()(0)
      val b2 = graft.pipeline.Stats.percentileReport(
        ((1L to 10L) ++ Seq.fill(10)(9L)).map(v => (1L, v))
          .toDF("k", "v"), Seq("k"), "v").collect()(0)
      assert((r2.getLong(1), r2.getLong(2), r2.getLong(3),
        r2.getLong(4)) == ((b2.getLong(1), b2.getLong(2),
        b2.getLong(3), b2.getLong(4))))
    } finally q.stop()
    // cap: an 11-distinct-value key against maxBins=4 dies loudly
    val mem2 = MemoryStream[(Long, Long)]
    val capped = StreamingPipeline.quantileStream(
      mem2.toDF().toDF("k", "v"), "k", "v", maxBins = 4)
    val q2 = capped.toDF().writeStream.format("memory")
      .queryName("qt_cap").outputMode("append").start()
    try {
      mem2.addData((1L to 11L).map(v => (1L, v)): _*)
      val ex = intercept[Exception] { q2.processAllAvailable() }
      assert(ex.getMessage.contains("quantile_stream"),
        s"wanted the named diagnosis, got: ${ex.getMessage}")
    } finally q2.stop()
  }

}
