package graft

import java.nio.file.Files

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LazyTileSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def writeGrid(dir: String): Unit =
    Seq(0, 1, 2, 3).toDF("id")
      .select($"id",
        rf_synthetic_tile($"id", 64, 64, "uint16").as("tile"),
        struct(($"id" % 2).cast("double").as("xmin"), lit(0.0).as("ymin"),
          ($"id" % 2 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
      .write.format("tiles").option("path", dir).mode("overwrite").save()

  test("lazy tiles defer cell reads and realize transparently") {
    val dir = Files.createTempDirectory("lazy").toString
    writeGrid(dir)
    val eager = spark.read.format("raster").option("path", dir).load()
    val lzy = spark.read.format("raster").option("path", dir)
      .option("lazy_tiles", "true").load()
    // metadata access touches no cells; cell ops realize transparently
    assert(lzy.select(rf_cell_type($"tile")).distinct().collect()(0).getString(0) == "uint16")
    val se = eager.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).collect()(0).getDouble(0)
    val sl = lzy.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).collect()(0).getDouble(0)
    assert(se == sl)
    // a lazy tile survives a shuffle (ref travels as the UDT's ref struct)
    val shuffled = lzy.repartition(4, $"path")
      .select(rf_tile_sum(rf_tile($"tile")).as("s")).agg(sum($"s")).collect()(0).getDouble(0)
    assert(shuffled == se)
  }

  test("buffered read + focal + crop gives seamless cross-tile focal") {
    val dir = Files.createTempDirectory("buffered").toString
    // one 128x128 image → four 64x64 tiles with a 1-cell halo
    val t = graft.core.Tile.empty(graft.core.CellType.float64, 128, 128)
    (0 until t.size).foreach(i => t.setDouble(i, (i % 128 + i / 128).toDouble))
    graft.core.geotiff.GeoTiff.write(s"$dir/img.tif", t,
      graft.core.Extent(0, 0, 128, 128), graft.core.crs.CRS.wgs84)

    val buffered = spark.read.format("geotiff").option("path", s"$dir/img.tif")
      .option("tile_dimensions", "64,64").option("buffer_size", "1").load()
    // focal mean over the buffered tile, then crop the halo away
    val focal = buffered.select($"spatial_key",
      rf_dimensions($"tile").as("d"),
      rf_focal_mean($"tile", "square-1").as("f"))
    // interior tiles are 66x66 (1-cell halo each side), edge-clipped otherwise
    val dims = focal.select($"d.cols", $"d.rows").collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(dims.forall { case (c, r) => c == 65 && r == 65 }) // corner tiles: halo on 2 sides
    // crop back to the 64² core: offset = 1 only on the buffered sides
    val whole = rf_focal_mean(
      rf_array_to_tile(lit((0 until t.size).map(i => (i % 128 + i / 128).toDouble).toArray), 128, 128),
      "square-1")
    // seam check: focal mean at the boundary column computed from the
    // buffered tile equals the whole-image focal mean at that position
    val tile00 = focal.where($"spatial_key.col" === 0 && $"spatial_key.row" === 0)
      .select(rf_tile_to_array_double(rf_crop($"f", 0, 0, 64, 64))).collect()(0).getSeq[Double](0)
    val wholeArr = spark.range(1).select(rf_tile_to_array_double(whole)).collect()(0).getSeq[Double](0)
    // position (63, 10) in tile(0,0) == whole-image position (10*128 + 63)
    assert(tile00(10 * 64 + 63) == wholeArr(10 * 128 + 63))
  }
}
