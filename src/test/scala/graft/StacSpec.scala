package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class StacSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("local STAC catalog walks to items with assets") {
    val dir = Files.createTempDirectory("stac").toString
    Files.write(Paths.get(s"$dir/catalog.json"),
      """{"type":"Catalog","id":"root","links":[
        |{"rel":"item","href":"item1.json"},{"rel":"child","href":"sub/collection.json"}]}""".stripMargin.getBytes)
    Files.createDirectories(Paths.get(s"$dir/sub"))
    Files.write(Paths.get(s"$dir/sub/collection.json"),
      """{"type":"Collection","id":"c1","links":[{"rel":"item","href":"item2.json"}]}""".getBytes)
    def item(id: String, lon: Double) =
      s"""{"type":"Feature","id":"$id","collection":"c1",
         |"bbox":[$lon,0,${lon+1},1],
         |"geometry":{"type":"Polygon","coordinates":[[[$lon,0],[${lon+1},0],[${lon+1},1],[$lon,1],[$lon,0]]]},
         |"properties":{"datetime":"2024-01-0${lon.toInt+1}T00:00:00Z"},
         |"assets":{"B1":{"href":"/data/$id-b1.tif"},"B2":{"href":"/data/$id-b2.tif"}}}""".stripMargin
    Files.write(Paths.get(s"$dir/item1.json"), item("i1", 0).getBytes)
    Files.write(Paths.get(s"$dir/sub/item2.json"), item("i2", 1).getBytes)

    val df = spark.read.format("stac").option("path", s"$dir/catalog.json").load()
    assert(df.count() == 2)
    val r = df.orderBy("id").collect()
    assert(r(0).getString(0) == "i1" && r(1).getString(0) == "i2")
    assert(r(0).getSeq[String](5) == Seq("B1", "B2"))
    assert(r(0).getSeq[String](6).head.endsWith("i1-b1.tif"))
    assert(r(0).getString(4).startsWith("POLYGON"))
    assert(r(1).getString(2) == "2024-01-02T00:00:00Z")
  }

  test("STAC catalog to tiles end-to-end: hrefs feed the raster pipeline") {
    import graft.core.{CellType, Extent, Tile}
    import graft.core.crs.CRS
    import graft.core.geotiff.GeoTiff
    import graft.functions._
    import org.apache.spark.sql.functions._

    val dir = Files.createTempDirectory("stac-e2e").toString
    // two items, each with two single-band asset tifs of known content
    for (i <- 0 until 2; b <- 1 to 2) {
      val t = Tile.empty(CellType.uint16, 128, 128)
      var c = 0
      while (c < t.size) { t.setDouble(c, (i * 10 + b).toDouble); c += 1 }
      GeoTiff.write(s"$dir/i$i-b$b.tif", t, Extent(i, 0, i + 1, 1), CRS.wgs84)
    }
    def item(i: Int) =
      s"""{"type":"Feature","id":"i$i","bbox":[$i,0,${i + 1},1],
         |"geometry":{"type":"Polygon","coordinates":[[[$i,0],[${i + 1},0],[${i + 1},1],[$i,1],[$i,0]]]},
         |"properties":{"datetime":"2024-01-0${i + 1}T00:00:00Z"},
         |"assets":{"B1":{"href":"$dir/i$i-b1.tif"},"B2":{"href":"$dir/i$i-b2.tif"}}}""".stripMargin
    Files.write(Paths.get(s"$dir/item0.json"), item(0).getBytes)
    Files.write(Paths.get(s"$dir/item1.json"), item(1).getBytes)
    Files.write(Paths.get(s"$dir/catalog.json"),
      """{"type":"Catalog","id":"root","links":[
        |{"rel":"item","href":"item0.json"},{"rel":"item","href":"item1.json"}]}""".stripMargin.getBytes)

    // catalog → per-item band href columns → window rows with lazy tiles
    val catalog = spark.read.format("stac").option("path", s"$dir/catalog.json").load()
      .select(col("id"),
        element_at(col("asset_hrefs"), 1).as("b1"),
        element_at(col("asset_hrefs"), 2).as("b2"))
    val tiles = catalog.select(col("id"),
      rf_raster_source_to_tiles((64, 64), lazyTiles = true, col("b1"), col("b2")))
    assert(tiles.count() == 2 * 4) // 2 items x (2x2 windows)
    val means = tiles.groupBy("id").agg(
      rf_agg_mean(col("b1")).as("m1"), rf_agg_mean(col("b2")).as("m2"))
      .orderBy("id").collect()
    assert(means(0).getDouble(1) == 1.0 && means(0).getDouble(2) == 2.0)
    assert(means(1).getDouble(1) == 11.0 && means(1).getDouble(2) == 12.0)
  }
}
