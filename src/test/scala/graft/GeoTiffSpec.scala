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

  test("GDAL_NODATA tag round-trips user-defined NoData cell types") {
    val ct = CellType.fromName("uint16ud255")
    val t = Tile.empty(ct, 10, 10)
    var i = 0
    while (i < t.size) { t.setDouble(i, if (i % 4 == 0) Double.NaN else i); i += 1 }
    val bytes = GeoTiff.writeBytes(t, Extent(0, 0, 10, 10), CRS.wgs84)
    val info = GeoTiff.parseInfo(bytes)
    assert(info.noData.contains(255.0))
    assert(info.cellType.name == "uint16ud255")
    val rt = GeoTiff.readWindow(bytes, info, GridBounds(0, 0, 9, 9))
    i = 0
    while (i < t.size) {
      if (i % 4 == 0) assert(rt.getDouble(i).isNaN, s"cell $i should stay NoData")
      else assert(rt.getDouble(i) == t.getDouble(i), s"cell $i")
      i += 1
    }
    // float default (NaN) writes 'nan' and reads back as plain float64
    val ft = Tile.empty(CellType.float64, 4, 4)
    ft.setDouble(3, Double.NaN)
    val fBytes = GeoTiff.writeBytes(ft, Extent(0, 0, 4, 4), CRS.wgs84)
    val fInfo = GeoTiff.parseInfo(fBytes)
    assert(fInfo.noData.exists(_.isNaN))
    assert(fInfo.cellType.name == "float64")
  }

  test("multiband write + band_indexes read selects bands correctly") {
    val dir = tmpDir
    val bands = (0 until 3).map { b =>
      val t = Tile.empty(CellType.uint16, 64, 48)
      var i = 0
      while (i < t.size) { t.setDouble(i, (i % 100) + b * 1000); i += 1 }
      t
    }
    GeoTiff.writeMultiband(s"$dir/mb.tif", bands, Extent(0, 0, 64, 48), CRS.wgs84)

    // codec level: band-selected windows
    val info = GeoTiff.readInfo(s"$dir/mb.tif")
    assert(info.samplesPerPixel == 3)
    for (b <- 0 until 3) {
      val w = GeoTiff.readWindowFile(s"$dir/mb.tif", info, GridBounds(10, 10, 19, 19), b)
      assert(w.getDouble(0, 0) == ((10 * 64 + 10) % 100) + b * 1000, s"band $b")
    }

    // DSv2 level: band_indexes option → tile_b<i> columns
    val df = spark.read.format("geotiff").option("path", s"$dir/mb.tif")
      .option("tile_dimensions", "64,48").option("band_indexes", "0,2").load()
    assert(df.columns.toSeq.endsWith(Seq("tile_b0", "tile_b2")))
    val r = df.select(
      rf_tile_max(col("tile_b0")).as("m0"),
      rf_tile_max(col("tile_b2")).as("m2")).collect()(0)
    assert(r.getDouble(0) == 99.0)
    assert(r.getDouble(1) == 2099.0)
    // lazy path also band-aware
    val lz = spark.read.format("geotiff").option("path", s"$dir/mb.tif")
      .option("tile_dimensions", "32,24").option("band_indexes", "1")
      .option("lazy_tiles", "true").load()
    val s1 = lz.select(rf_tile_max(col("tile_b1")).as("m")).agg(max(col("m"))).collect()(0).getDouble(0)
    assert(s1 == 1099.0)
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
