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

  test("hilbert-ordered layer writes round-trip with identical content and pruning") {
    val dir = Files.createTempDirectory("layer_hi").toString
    val df = (0 until 20).toDF("id")
      .select($"id",
        rf_synthetic_tile($"id", 16, 16, "uint16").as("tile"),
        struct(($"id" % 5 * 2).cast("double").as("xmin"), lit(0.0).as("ymin"),
          ($"id" % 5 * 2 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
    val expected = df.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).collect()(0).getDouble(0)
    Layer.write(df, dir, partitions = 4, index = "hilbert")
    val back = Layer.read(spark, dir)
    // the spatial_index column now carries the hilbert key — it must
    // differ from the XZ2 key of the same geometry (a real re-ordering,
    // not a silently ignored option)
    val cmp = back.select(
      rf_xz2_index(st_geometry($"extent"), $"crs").as("xz2"),
      $"spatial_index").where($"spatial_index" =!= $"xz2")
    assert(cmp.count() > 0, "hilbert index identical to xz2 for every row")
    val total = back.select(rf_tile_sum($"tile").as("s")).agg(sum($"s")).collect()(0).getDouble(0)
    assert(total == expected)
    // pruning semantics are index-agnostic (extent-field predicates)
    assert(Layer.read(spark, dir, Some(Extent(0, 0, 1, 1))).count() == 4)
    assert(intercept[IllegalArgumentException] {
      Layer.write(df, dir, index = "morton")
    }.getMessage.contains("xz2"))
  }

  private def keyedLayer(offset: Double) = (0 until 6).toDF("id")
    .select(
      struct(($"id" % 3).cast("int").as("col"), ($"id" / 3).cast("int").as("row")).as("spatial_key"),
      rf_make_constant_tile($"id".cast("double") + offset, 8, 8, "float64").as("tile"),
      struct(($"id" % 3).cast("double").as("xmin"), lit(0.0).as("ymin"),
        ($"id" % 3 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
      lit("epsg:4326").as("crs"))

  test("spatialJoin key-aligns two layers and prefixes collisions") {
    val joined = Layer.spatialJoin(keyedLayer(0.0), keyedLayer(100.0))
    assert(joined.count() == 6)
    assert(joined.columns.contains("tile") && joined.columns.contains("right_tile"))
    val diffs = joined.select(
      rf_tile_mean(rf_local_subtract($"right_tile", $"tile")).as("d"))
      .distinct().collect().map(_.getDouble(0))
    assert(diffs.toSeq == Seq(100.0))
    // left-outer keeps unmatched keys
    val sparseRight = keyedLayer(5.0).where($"spatial_key.col" === 0)
    val outer = Layer.spatialJoin(keyedLayer(0.0), sparseRight, "left_outer")
    assert(outer.count() == 6)
    assert(outer.where($"right_tile".isNull).count() == 4)
  }

  test("spatialJoin warns when layer CRS/layouts differ") {
    val reprojected = keyedLayer(0.0).withColumn("crs", lit("epsg:3857"))
    val buf = new java.io.ByteArrayOutputStream()
    val joined = Console.withErr(buf) {
      val j = Layer.spatialJoin(keyedLayer(0.0), reprojected)
      j.count() // force the layout probes + join
      j
    }
    assert(joined.count() == 6) // still joins — warning, not an error
    val err = buf.toString("UTF-8")
    assert(err.contains("different CRS/layout"), s"expected layout warning, got: $err")
    assert(err.contains("epsg:3857"))
  }

  test("metadata aggregates union extent, key bounds, cell type, dims") {
    val m = Layer.metadata(keyedLayer(0.0)).collect()(0)
    val ext = m.getStruct(m.fieldIndex("extent"))
    assert(ext.getDouble(0) == 0.0 && ext.getDouble(2) == 3.0)
    assert(m.getString(m.fieldIndex("crs")) == "epsg:4326")
    assert(m.getString(m.fieldIndex("cell_type")) == "float64")
    val dims = m.getStruct(m.fieldIndex("tile_dimensions"))
    assert(dims.getInt(0) == 8 && dims.getInt(1) == 8)
    assert(m.getLong(m.fieldIndex("tile_count")) == 6L)
    assert(m.getInt(m.fieldIndex("key_col_max")) == 2)
    assert(m.getInt(m.fieldIndex("key_row_max")) == 1)
  }
}
