package graft

import java.nio.file.Files

import graft.core._
import graft.core.crs.CRS
import graft.core.geotiff.GeoTiff
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GeoTiffSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def tmpDir: String = Files.createTempDirectory("graft-tiff").toString

  test("codec round-trip across cell types") {
    for (ctName <- Seq("uint8", "int16", "uint16", "int32", "float32", "float64")) {
      val ct = CellType.fromName(ctName)
      val t = Tile.empty(ct, 100, 80)
      var i = 0
      while (i < t.size) { t.setDouble(i, (i % 250) + 1); i += 1 }
      val extent = Extent(10, 20, 30, 40)
      val bytes = GeoTiff.writeBytes(t, extent, CRS.wgs84)
      val info = GeoTiff.parseInfo(bytes)
      assert(info.cols == 100 && info.rows == 80)
      assert(info.extent == extent)
      assert(info.crs.normalized == "epsg:4326")
      val rt = GeoTiff.readWindow(bytes, info, GridBounds(0, 0, 99, 79))
      assert(rt.cellType.base == ct.base, s"$ctName base")
      i = 0
      while (i < t.size) {
        assert(rt.getDouble(i) == t.getDouble(i), s"$ctName cell $i")
        i += 1
      }
    }
  }

  test("windowed read touches only requested window") {
    val t = Tile.empty(CellType.int32, 300, 200)
    var i = 0
    while (i < t.size) { t.setDouble(i, i.toDouble); i += 1 }
    val bytes = GeoTiff.writeBytes(t, Extent(0, 0, 300, 200), CRS.webMercator)
    val info = GeoTiff.parseInfo(bytes)
    val win = GeoTiff.readWindow(bytes, info, GridBounds(100, 50, 149, 99))
    assert(win.cols == 50 && win.rows == 50)
    assert(win.getDouble(0, 0) == (50 * 300 + 100).toDouble)
    assert(win.getDouble(49, 49) == (99 * 300 + 149).toDouble)
  }

  test("tiles writer + geotiff/raster reader round-trip through Spark") {
    val dir = tmpDir
    // write 4 tiles on a 2x2 grid
    val df = Seq(0, 1, 2, 3).toDF("id")
      .select($"id",
        rf_synthetic_tile($"id", 64, 64, "uint16").as("tile"),
        struct(($"id" % 2).cast("double").as("xmin"),
          ($"id" / 2).cast("int").cast("double").as("ymin"),
          ($"id" % 2 + 1).cast("double").as("xmax"),
          ($"id" / 2 + 1).cast("int").cast("double").as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
    df.write.format("tiles").option("path", dir).mode("overwrite").save()
    assert(new java.io.File(s"$dir/catalog.csv").exists())
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".tif")) == 4)

    val back = spark.read.format("raster").option("path", dir)
      .option("tile_dimensions", "64,64").load()
    assert(back.count() == 4)
    val sums = back.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).collect()(0).getDouble(0)
    val expected = df.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).collect()(0).getDouble(0)
    assert(sums == expected)
    // column pruning: metadata-only query must not decode tiles (and must be fast/correct)
    val keys = back.select($"spatial_key.col", $"crs").distinct().collect()
    assert(keys.forall(_.getString(1) == "epsg:4326"))
  }

  test("single geotiff writer mosaics tiles") {
    val dir = tmpDir
    val path = s"$dir/mosaic.tif"
    val df = Seq(0, 1).toDF("id")
      .select(
        rf_make_constant_tile(lit(5.0), 32, 32, "float64").as("tile"),
        struct(($"id").cast("double").as("xmin"), lit(0.0).as("ymin"),
          ($"id" + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
    df.write.format("geotiff").option("path", path).mode("overwrite").save()
    val (t, extent, crs) = GeoTiff.read(path)
    assert(extent == Extent(0, 0, 2, 1))
    assert(t.cols == 64 && t.rows == 32)
    assert(t.getDouble(10, 10) == 5.0 && t.getDouble(50, 10) == 5.0)
  }
}
