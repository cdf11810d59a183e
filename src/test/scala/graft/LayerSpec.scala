package graft

import java.nio.file.Files

import graft.core.Extent
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayerSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("tiles round-trip Parquet as bare structs and expressions still work") {
    val dir = Files.createTempDirectory("layer").toString
    val df = (0 until 20).toDF("id")
      .select($"id",
        rf_synthetic_tile($"id", 16, 16, "uint16").as("tile"),
        struct(($"id" % 5 * 2).cast("double").as("xmin"), lit(0.0).as("ymin"),
          ($"id" % 5 * 2 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
    val expected = df.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).collect()(0).getDouble(0)

    Layer.write(df, dir, partitions = 4)
    val back = Layer.read(spark, dir)
    assert(back.columns.contains("spatial_index"))
    // tile column is now the bare struct — all expressions must still accept it
    val total = back.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).collect()(0).getDouble(0)
    assert(total == expected)
    assert(back.select(rf_cell_type($"tile")).distinct().collect()(0).getString(0) == "uint16")

    // spatial query prunes to the matching extents
    val sub = Layer.read(spark, dir, Some(Extent(0, 0, 1, 1)))
    assert(sub.count() == 4) // ids with id % 5 == 0
  }
}
