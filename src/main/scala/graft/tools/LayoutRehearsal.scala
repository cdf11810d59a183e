package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Layout

/**
 * 100× layout rehearsal — the first scaling point for LayoutSpec's
 * measured row-group-pruning panel (the r17 "83% skipped / 5.8× rows"
 * number was 4096 rows over 16 files): the SAME 8-rectangle predicate
 * panel, geometry scaled 16× (a 1024×1024 key grid, ~1M rows) over
 * **256 files**, i.e. 16× the files and 256× the rows of the spec —
 * the closest thing to a cluster-layout rehearsal the sandbox allows.
 * Counts are deterministic (footer min-max walk, the exact statistics
 * the parquet reader prunes on), so the artifact is a count table, not
 * a timing: commit the printed totals to README each time they move.
 *
 * Usage: `java -cp ... graft.tools.LayoutRehearsal [gridBits] [files]`
 * (defaults 10 → 1024×1024 grid, 256 files).
 */
object LayoutRehearsal {
  def main(args: Array[String]): Unit = {
    val bits = args.headOption.map(_.toInt).getOrElse(10)
    val files = if (args.length > 1) args(1).toInt else 256
    require(bits >= 6 && bits <= 12, s"gridBits in [6,12], got $bits")
    val side = 1L << bits
    val scale = side / 64L // LayoutSpec's panel is on a 64x64 grid
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-layout-rehearsal")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(side * side)
      .select((col("id") % side).as("a"), (col("id") / side).cast("long").as("b"))
    // LayoutSpec's 8-rectangle panel (half straddling dyadic seams),
    // scaled to the grid: lo*scale .. (hi+1)*scale-1 keeps each
    // rectangle's relative position and relative area identical
    val rects = Seq(
      (3L, 9L, 5L, 11L), (29L, 36L, 29L, 36L), (13L, 20L, 45L, 52L),
      (56L, 63L, 0L, 7L), (30L, 37L, 5L, 12L), (14L, 21L, 14L, 21L),
      (46L, 53L, 46L, 53L), (0L, 7L, 30L, 37L)
    ).map { case (aLo, aHi, bLo, bHi) =>
      (aLo * scale, (aHi + 1) * scale - 1, bLo * scale, (bHi + 1) * scale - 1)
    }

    def rowGroups(path: String): Seq[(Long, Long, Long, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      val conf = new org.apache.hadoop.conf.Configuration()
      val dir = new org.apache.hadoop.fs.Path(path)
      val fs = dir.getFileSystem(conf)
      fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet")).toSeq
        .flatMap { st =>
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(st.getPath, conf))
          try rdr.getFooter.getBlocks.asScala.toSeq.map { blk =>
            val byName = blk.getColumns.asScala
              .map(c => c.getPath.toDotString -> c.getStatistics).toMap
            def mm(n: String) = (
              byName(n).genericGetMin.asInstanceOf[Number].longValue,
              byName(n).genericGetMax.asInstanceOf[Number].longValue)
            val ((amin, amax), (bmin, bmax)) = (mm("a"), mm("b"))
            (blk.getRowCount, amin, amax, bmin, bmax)
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

    val up = java.nio.file.Files.createTempDirectory("graft_reh_u").toString
    val zp = java.nio.file.Files.createTempDirectory("graft_reh_z").toString
    val hp = java.nio.file.Files.createTempDirectory("graft_reh_h").toString
    df.repartition(files).write.mode("overwrite").parquet(up)
    Layout.zorderWrite(df, "a", "b", zp, files = files)
    Layout.hilbertWrite(df, "a", "b", hp, files = files)

    var (uS, zS, hS) = (0, 0, 0); var uT = 0
    var (uR, zR, hR) = (0L, 0L, 0L)
    rects.foreach { r =>
      val (us, ut, ur) = skipStats(up, r)
      val (zs, _, zr) = skipStats(zp, r)
      val (hs, _, hr) = skipStats(hp, r)
      println(s"rect $r of $ut groups: unsorted skip $us ($ur rows), " +
        s"z-order skip $zs ($zr rows), hilbert skip $hs ($hr rows)")
      uS += us; zS += zs; hS += hs; uT = ut
      uR += ur; zR += zr; hR += hr
    }
    val panels = rects.length * uT
    println(f"PANEL ${side}x$side grid, $files files, $uT row-groups/layout:")
    println(f"  unsorted: skipped $uS%5d / $panels (${100.0 * uS / panels}%.1f%%), $uR%9d rows")
    println(f"  z-order : skipped $zS%5d / $panels (${100.0 * zS / panels}%.1f%%), $zR%9d rows")
    println(f"  hilbert : skipped $hS%5d / $panels (${100.0 * hS / panels}%.1f%%), $hR%9d rows")
    println(f"  row reduction vs unsorted: z ${uR.toDouble / zR}%.1fx, hilbert ${uR.toDouble / hR}%.1fx")
    spark.stop()
  }
}
