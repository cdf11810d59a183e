package graft

import graft.functions._
import graft.ml.{NoDataFilter, TileExploder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RenderMlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def tiles = Seq((1, Seq[java.lang.Double](1.0, null, 3.0, 4.0)))
    .toDF("id", "a")
    .select($"id", rf_array_to_tile($"a", 2, 2).as("t"))

  test("render ascii/matrix/png") {
    val r = tiles.select(
      rf_render_ascii($"t"), rf_render_matrix($"t"), rf_render_png($"t")).collect()(0)
    assert(r.getString(0).linesIterator.size == 2)
    assert(r.getString(1).contains("--")) // NoData marker
    val png = r.getAs[Array[Byte]](2)
    assert(png.length > 8 && (png(1) & 0xff) == 'P'.toInt && (png(2) & 0xff) == 'N'.toInt)
  }

  test("rgb composite packs bands") {
    val r = tiles.select(rf_tile_max(rf_rgb_composite($"t", $"t", $"t")).as("mx")).collect()(0)
    assert(r.getDouble(0) == 0xffffff.toDouble)
  }

  test("color ramp render: quantized levels, interpolated stops, bad names fail") {
    def decode(png: Array[Byte]): java.awt.image.BufferedImage =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    // 1x4 values 0..3 -> t = 0, 1/3, 2/3, 1
    val t4 = Seq((1, Seq[java.lang.Double](0.0, 1.0, 2.0, 3.0))).toDF("id", "a")
      .select(rf_array_to_tile($"a", 4, 1).as("t"))
    // Greyscale2: exactly two distinct gray levels (0 and 255)
    val g2 = decode(t4.select(rf_render_png($"t", "Greyscale2")).collect()(0).getAs[Array[Byte]](0))
    val grays = (0 until 4).map(c => g2.getRGB(c, 0) & 0xff).distinct.sorted
    assert(grays == Seq(0, 255), s"Greyscale2 levels: $grays")
    // Viridis: endpoints are the first/last stops; midpoints interpolate
    val vir = decode(t4.select(rf_render_png($"t", "Viridis")).collect()(0).getAs[Array[Byte]](0))
    assert((vir.getRGB(0, 0) & 0xffffff) == 0x440154)
    assert((vir.getRGB(3, 0) & 0xffffff) == 0xFDE725)
    // NoData cell renders transparent through a ramp
    val pngNd = tiles.select(rf_render_png($"t", "Viridis")).collect()(0).getAs[Array[Byte]](0)
    val nd = decode(pngNd)
    assert((0 until 2).flatMap(r => (0 until 2).map(c => nd.getRGB(c, r) >>> 24)).count(_ == 0) == 1)
    // unknown ramp name fails analysis listing valid names
    val err = intercept[Exception](tiles.select(rf_render_png($"t", "NotARamp")).collect())
    assert(err.getMessage.contains("NotARamp") && err.getMessage.contains("Viridis"))
    // three-band form: each pixel is the packed composite (here gray, all bands equal)
    val rgb = decode(tiles.select(rf_render_png($"t", $"t", $"t")).collect()(0).getAs[Array[Byte]](0))
    val px = rgb.getRGB(1, 1) // cell value 4.0 = band max -> 255 per band
    assert((px & 0xffffff) == 0xffffff && (px >>> 24) == 0xff)
  }

  test("rf_mk_crs normalizes supported identifiers, rejects junk") {
    val r = spark.sql("SELECT rf_mk_crs('EPSG:4326') AS a, rf_mk_crs(' epsg:32610 ') AS b").collect()(0)
    assert(r.getString(0) == "epsg:4326" && r.getString(1) == "epsg:32610")
    val err = intercept[Exception](spark.sql("SELECT rf_mk_crs('EPSG:99999')").collect())
    assert(err.getMessage.contains("Unsupported CRS"))
  }

  test("TileExploder + NoDataFilter pipeline") {
    val exploded = new TileExploder().transform(tiles)
    assert(exploded.columns.toSeq == Seq("id", "column_index", "row_index", "t"))
    assert(exploded.count() == 4)
    val filtered = new NoDataFilter().setInputCols(Array("t")).transform(exploded)
    assert(filtered.count() == 3)
  }
}
