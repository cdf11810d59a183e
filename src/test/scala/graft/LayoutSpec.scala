package graft

import graft.pipeline.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("zIndex interleaves bits (matches the reference Morton order)") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.zIndex(col("a"), col("b"))).as[Long].collect().toSeq
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .map { case (a, b) => graft.expressions.Z2Index.interleave(a, b, 16) }
    assert(got == want)
  }

  test("zIndex stays in whole-stage codegen (no expression fallback)") {
    val plan = spark.range(4)
      .select(Layout.zIndex(col("id"), col("id") + 1).as("z"))
      .queryExecution.executedPlan.toString
    // whole-stage-codegen'd operators print with a *(stageId) prefix
    assert(plan.contains("*(1) Project"), s"no codegen span in:\n$plan")
  }

  test("zorderWrite produces files with DISJOINT z ranges (pruning precondition)") {
    val path = java.nio.file.Files.createTempDirectory("graft_layout_spec").toString
    val df = spark.range(4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    Layout.zorderWrite(df, "a", "b", path, files = 8)
    val ranges = spark.read.parquet(path)
      .select(input_file_name().as("f"), Layout.zIndex(col("a"), col("b")).as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple output files")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping per-file z ranges: $ranges")
    }
    // round-trip: no rows lost or duplicated
    assert(spark.read.parquet(path).count() == 4096)
  }

  test("hilbertIndex matches the scalar kernel and hilbertWrite keeps files disjoint") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Layout.hilbertIndex(col("a"), col("b"))).as[Long].collect().toSeq
    val want = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .map { case (a, b) => graft.expressions.HilbertIndex.xy2d(16, a, b) }
    assert(got == want)
    val path = java.nio.file.Files.createTempDirectory("graft_layout_h").toString
    val df = spark.range(4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    Layout.hilbertWrite(df, "a", "b", path, files = 8)
    val ranges = spark.read.parquet(path)
      .select(input_file_name().as("f"),
        Layout.hilbertIndex(col("a"), col("b")).as("h"))
      .groupBy("f").agg(min("h").as("lo"), max("h").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple output files")
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping per-file h ranges: $ranges")
    }
    assert(spark.read.parquet(path).count() == 4096)
  }

  test("hilbert files cover tighter key rectangles than z-order on the same grid") {
    // the locality claim, MEASURED: per-file bounding-rectangle area
    // (da+1)*(db+1) summed over files — Hilbert's step adjacency keeps
    // each file's keys in one compact blob; Z jumps at quadrant seams
    val df = spark.range(4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    def area(path: String): Long = {
      spark.read.parquet(path)
        .select(input_file_name().as("f"), col("a"), col("b"))
        .groupBy("f").agg(((max("a") - min("a") + 1) *
          (max("b") - min("b") + 1)).as("area"))
        .collect().map(_.getLong(1)).sum
    }
    val zp = java.nio.file.Files.createTempDirectory("graft_layout_z3").toString
    val hp = java.nio.file.Files.createTempDirectory("graft_layout_h3").toString
    Layout.zorderWrite(df, "a", "b", zp, files = 8)
    Layout.hilbertWrite(df, "a", "b", hp, files = 8)
    val (za, ha) = (area(zp), area(hp))
    assert(ha <= za, s"hilbert rectangles ($ha) should not exceed z-order's ($za)")
  }

  test("row groups SKIPPED under a range predicate: hilbert >= z-order >> unsorted") {
    // The user-visible payoff of the layout writers, measured two ways:
    //  1. footer simulation — walk every file's row-group min-max stats
    //     (the EXACT stats the parquet reader prunes on) and count the
    //     groups whose [min,max] rectangle misses the predicate;
    //  2. live cross-check — run the filtered scan and read the leaf
    //     FileSourceScan's numOutputRows metric: skipped row groups
    //     contribute ZERO rows to the scan output, so materialized rows
    //     must equal the rows of exactly the surviving groups.
    val df = spark.range(4096)
      .select((col("id") % 64).as("a"), (col("id") / 64).cast("long").as("b"))
    // a panel of 7x7 / 8x8 rectangles, half straddling the dyadic
    // quadrant seams (a or b crossing 16/32/48) where Z-order's
    // bit-interleave jumps — single-rectangle comparisons are boundary
    // luck; the panel total is the honest statistic
    val rects = Seq(
      (3L, 9L, 5L, 11L), (29L, 36L, 29L, 36L), (13L, 20L, 45L, 52L),
      (56L, 63L, 0L, 7L), (30L, 37L, 5L, 12L), (14L, 21L, 14L, 21L),
      (46L, 53L, 46L, 53L), (0L, 7L, 30L, 37L))

    def rowGroups(path: String): Seq[(Long, Long, Long, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val conf = new org.apache.hadoop.conf.Configuration()
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet")).toSeq
        .flatMap { st =>
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
          try rdr.getFooter.getBlocks.asScala.toSeq.map { b =>
            val byName = b.getColumns.asScala
              .map(c => c.getPath.toDotString -> c.getStatistics).toMap
            def mm(n: String) = (
              byName(n).genericGetMin.asInstanceOf[Number].longValue,
              byName(n).genericGetMax.asInstanceOf[Number].longValue)
            val ((amin, amax), (bmin, bmax)) = (mm("a"), mm("b"))
            (b.getRowCount, amin, amax, bmin, bmax)
          } finally rdr.close()
        }
    }
    def skipStats(path: String, r: (Long, Long, Long, Long)): (Int, Int, Long) = {
      val (aLo, aHi, bLo, bHi) = r
      val gs = rowGroups(path)
      val surviving = gs.filter { case (_, amin, amax, bmin, bmax) =>
        amin <= aHi && amax >= aLo && bmin <= bHi && bmax >= bLo }
      (gs.length - surviving.length, gs.length, surviving.map(_._1).sum)
    }
    def scanRows(path: String, r: (Long, Long, Long, Long)): Long = {
      val (aLo, aHi, bLo, bHi) = r
      val q = spark.read.parquet(path)
        .where(col("a").between(aLo, aHi) && col("b").between(bLo, bHi))
      assert(q.count() == (aHi - aLo + 1) * (bHi - bLo + 1)) // any layout
      q.collect()
      q.queryExecution.executedPlan.collectLeaves()
        .head.metrics("numOutputRows").value
    }

    val up = java.nio.file.Files.createTempDirectory("graft_layout_u4").toString
    val zp = java.nio.file.Files.createTempDirectory("graft_layout_z4").toString
    val hp = java.nio.file.Files.createTempDirectory("graft_layout_h4").toString
    df.repartition(16).write.mode("overwrite").parquet(up) // no layout
    Layout.zorderWrite(df, "a", "b", zp, files = 16)
    Layout.hilbertWrite(df, "a", "b", hp, files = 16)
    var (uSkipT, zSkipT, hSkipT, uRowsT, zRowsT, hRowsT) = (0, 0, 0, 0L, 0L, 0L)
    rects.foreach { r =>
      val (uSkip, uTot, uRows) = skipStats(up, r)
      val (zSkip, _, zRows) = skipStats(zp, r)
      val (hSkip, _, hRows) = skipStats(hp, r)
      info(s"rect $r of $uTot groups: skipped unsorted $uSkip ($uRows rows), " +
        s"z-order $zSkip ($zRows rows), hilbert $hSkip ($hRows rows)")
      // live reader agrees with the footer simulation, all three layouts
      assert(scanRows(up, r) == uRows)
      assert(scanRows(zp, r) == zRows)
      assert(scanRows(hp, r) == hRows)
      uSkipT += uSkip; zSkipT += zSkip; hSkipT += hSkip
      uRowsT += uRows; zRowsT += zRows; hRowsT += hRows
    }
    info(s"panel totals: skipped unsorted $uSkipT ($uRowsT rows), " +
      s"z-order $zSkipT ($zRowsT rows), hilbert $hSkipT ($hRowsT rows)")
    // round-robin files all span the full key range: nothing skippable
    assert(uSkipT == 0, s"unsorted should skip nothing, skipped $uSkipT")
    // both layouts prune hard (>=75% of group-reads skipped over the
    // panel); hilbert at least matches z-order on groups AND rows
    assert(zSkipT >= rects.length * 12 && hSkipT >= rects.length * 12)
    assert(hSkipT >= zSkipT, s"hilbert skipped $hSkipT < z-order's $zSkipT")
    assert(hRowsT <= zRowsT && zRowsT < uRowsT / 2,
      s"rows materialized: hilbert $hRowsT, z $zRowsT, unsorted $uRowsT")
  }

  test("range filters on both z keys are pushed to the parquet scan") {
    val path = java.nio.file.Files.createTempDirectory("graft_layout_spec2").toString
    val df = spark.range(1024)
      .select((col("id") % 32).as("a"), (col("id") / 32).cast("long").as("b"))
    Layout.zorderWrite(df, "a", "b", path, files = 4)
    val plan = spark.read.parquet(path)
      .where(col("a").between(3, 9) && col("b").between(5, 11))
      .queryExecution.executedPlan.toString
    // the PushedFilters list is truncated in toString — assert the list
    // exists and carries the range predicates that survive the cut
    assert(plan.contains("PushedFilters: [IsNotNull(a)") &&
      plan.contains("GreaterThanOrEqual(a,3)") && plan.contains("LessThanOrEqual(a,9)"),
      s"filters not pushed to scan:\n$plan")
  }

  test("shardBalance: exact mix64 assignment, weights, deviation formula") {
    val df = spark.range(1000).select(col("id"), (col("id") % 7 + 1).as("w"))
    val out = Layout.shardBalance(df, "id", col("w"), shards = 16)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // replay the assignment driver-side
    val exp = (0L until 1000L).map(i => (graft.pipeline.Hashing.mix64(i) & 15L, i % 7 + 1))
      .groupBy(_._1).map { case (s, xs) => s -> (xs.size.toLong, xs.map(_._2).sum) }
    val tot = exp.values.map(_._2).sum
    assert(out.keySet == exp.keySet)
    exp.foreach { case (s, (n, w)) =>
      val (gn, gw, dev) = out(s)
      assert(gn == n && gw == w)
      assert(dev == w * 16L * 1000L / tot - 1000L)
    }
    // the mask-equals-modulus contract requires a power of two
    intercept[IllegalArgumentException] {
      Layout.shardBalance(df, "id", col("w"), shards = 48)
    }
  }
}
