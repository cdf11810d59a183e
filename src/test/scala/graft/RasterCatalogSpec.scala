package graft

import java.nio.file.Files

import graft.core.{CellType, Extent, Tile}
import graft.core.crs.CRS
import graft.core.geotiff.GeoTiff
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RasterCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("multiband catalog expands to windows with one lazy tile per band") {
    val dir = Files.createTempDirectory("catalog").toString
    // two scenes × two bands, 128x128 → expect 4 windows per scene at 64²
    for (scene <- 0 until 2; band <- 1 to 2) {
      val t = Tile.empty(CellType.uint16, 128, 128)
      (0 until t.size).foreach(i => t.setDouble(i, (scene * 1000 + band * 100 + i % 50).toDouble))
      GeoTiff.write(s"$dir/scene${scene}_b$band.tif", t,
        Extent(scene * 2, 0, scene * 2 + 1, 1), CRS.wgs84)
    }
    val catalog = Seq(
      (s"$dir/scene0_b1.tif", s"$dir/scene0_b2.tif", "s0"),
      (s"$dir/scene1_b1.tif", s"$dir/scene1_b2.tif", "s1"))
      .toDF("b1", "b2", "scene")

    val expanded = catalog.select(col("scene"),
      rf_raster_source_to_tiles((64, 64), lazyTiles = true, col("b1"), col("b2")))
    assert(expanded.columns.toSeq ==
      Seq("scene", "spatial_key", "extent", "crs", "b1", "b2"))
    assert(expanded.count() == 8) // 2 scenes × 4 windows

    val sums = expanded
      .groupBy("scene")
      .agg(rf_agg_mean(col("b1")).as("m1"), rf_agg_mean(col("b2")).as("m2"))
      .orderBy("scene").collect()
    // band means differ by exactly 100 (construction), scenes by 1000
    assert(math.abs(sums(0).getDouble(2) - sums(0).getDouble(1) - 100.0) < 1e-9)
    assert(math.abs(sums(1).getDouble(1) - sums(0).getDouble(1) - 1000.0) < 1e-9)

    // band math across bands of the same window
    val nd = expanded.select(
      rf_tile_mean(rf_normalized_difference(col("b2"), col("b1"))).as("nd")).collect()
    assert(nd.forall(r => r.getDouble(0) > 0)) // b2 > b1 everywhere
  }
}
