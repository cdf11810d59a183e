package graft

import graft.core.crs.CRS
import graft.expressions.XZ2Index
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CrsSpec extends AnyFunSuite {
  test("web mercator forward/inverse known constants") {
    val (x, y) = CRS.fromLonLat(10.0, 50.0, CRS.webMercator)
    assert(math.abs(x - 1113194.9079327357) < 1e-6)
    assert(math.abs(y - 6446275.841017158) < 1e-6)
    val (lon, lat) = CRS.toLonLat(x, y, CRS.webMercator)
    assert(math.abs(lon - 10.0) < 1e-9 && math.abs(lat - 50.0) < 1e-9)
  }
  test("UTM 18N known point (Washington DC)") {
    // EPSG:32618; cross-checked against Simpson-integrated meridian arc +
    // Snyder forward series computed independently: (323396.5, 4307106.9)
    val (e, n) = CRS.fromLonLat(-77.0364, 38.8951, CRS("epsg:32618"))
    assert(math.abs(e - 323396.5) < 1.0, s"easting $e")
    assert(math.abs(n - 4307106.9) < 1.0, s"northing $n")
    val (lon, lat) = CRS.toLonLat(e, n, CRS("epsg:32618"))
    assert(math.abs(lon - -77.0364) < 1e-6 && math.abs(lat - 38.8951) < 1e-6)
  }
  test("southern hemisphere UTM round-trip") {
    val (e, n) = CRS.fromLonLat(151.2093, -33.8688, CRS("epsg:32756"))
    assert(n > 0 && n < 10000000)
    val (lon, lat) = CRS.toLonLat(e, n, CRS("epsg:32756"))
    assert(math.abs(lon - 151.2093) < 1e-6 && math.abs(lat - -33.8688) < 1e-6)
  }
}

class SpatialSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("predicates over boxes and wkt") {
    val df = Seq((10.0, 2.0), (27.0, 3.0), (40.0, 8.0)).toDF("x", "y")
      .select(st_geometry(struct($"x".as("xmin"), $"y".as("ymin"),
        ($"x" + 3.0).as("xmax"), ($"y" + 2.0).as("ymax"))).as("a"),
        st_geomFromWKT(lit("POLYGON ((25 3, 35 3, 35 5, 25 5, 25 3))")).as("b"))
    val r = df.select(st_intersects($"a", $"b"), st_within($"a", $"b"), st_disjoint($"a", $"b"))
      .collect()
    assert(r(0).getBoolean(0) == false && r(0).getBoolean(2) == true)
    assert(r(1).getBoolean(0) == true && r(1).getBoolean(1) == true)
    assert(r(2).getBoolean(0) == false)
  }

  test("st accessors exact on integer boxes") {
    val df = Seq((10.0, 2.0), (27.0, 3.0)).toDF("x", "y")
      .select($"x", $"y", st_geometry(struct($"x".as("xmin"), $"y".as("ymin"),
        ($"x" + 3.0).as("xmax"), ($"y" + 2.0).as("ymax"))).as("a"))
    val r = df.select(st_area($"a"), st_x(st_centroid($"a")), st_y(st_centroid($"a")),
      st_x(st_makePoint($"x", $"y")), $"x").collect()
    for (row <- r) {
      assert(row.getDouble(0) == 6.0)
      assert(row.getDouble(1) == row.getDouble(4) + 1.5)
      assert(row.getDouble(3) == row.getDouble(4))
    }
  }

  test("z2/xz2 index ordering and determinism") {
    val df = Seq((0.0, 0.0), (10.0, 10.0), (10.0, 10.0)).toDF("x", "y")
      .select(rf_z2_index(st_makePoint($"x", $"y"), lit("epsg:4326")).as("z2"),
        rf_xz2_index(st_buffer(st_makePoint($"x", $"y"), lit(1.0)), lit("epsg:4326")).as("xz2"))
    val r = df.collect()
    assert(r(1).getLong(0) == r(2).getLong(0))
    assert(r(1).getLong(1) == r(2).getLong(1))
    assert(r(0).getLong(0) != r(1).getLong(0))
    // XZ2 of a small box near origin differs from one near (10,10)
    assert(r(0).getLong(1) != r(1).getLong(1))
  }

  test("rasterize burns value inside polygon") {
    val df = Seq((4.0, 2.0)).toDF("x", "y")
      .select(rf_rasterize(
        st_geometry(struct($"x".as("xmin"), $"y".as("ymin"),
          ($"x" + 3.0).as("xmax"), ($"y" + 2.0).as("ymax"))),
        st_geometry(struct(lit(0.0).as("xmin"), lit(0.0).as("ymin"),
          lit(16.0).as("xmax"), lit(16.0).as("ymax"))),
        lit(7.0), 16, 16).as("t"))
    val r = df.select(rf_data_cells($"t"), rf_tile_sum($"t")).collect()(0)
    assert(r.getLong(0) == 6L) // 3x2 cell centers inside
    assert(r.getDouble(1) == 42.0)
  }

  test("st_reproject 4326 -> 3857 via SQL surface") {
    val r = spark.sql(
      """SELECT st_x(st_reproject(st_makepoint(10.0, 50.0), 'epsg:4326', 'epsg:3857')) AS x""")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1113194.9079327357) < 1e-6)
  }

  test("raster join: self-join on disjoint grid is identity") {
    val base = Seq((0L, Seq(1.0, 2.0, 3.0, 4.0)), (1L, Seq(10.0, 20.0, 30.0, 40.0)))
      .toDF("k", "vals")
      .select($"k", rf_array_to_tile($"vals", 2, 2).as("tile"),
        struct(($"k" * 2).cast("double").as("xmin"), lit(0.0).as("ymin"),
          ($"k" * 2 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
    val joined = RasterJoin(base, base.select($"tile".as("r_tile"), $"extent".as("r_extent"), $"crs".as("r_crs")),
      col("extent"), col("crs"), col("tile"),
      col("r_extent"), col("r_crs"), col("r_tile"))
    val r = joined.select($"k", rf_tile_sum($"right_tile").as("s")).orderBy("k").collect()
    assert(r(0).getDouble(1) == 10.0)
    assert(r(1).getDouble(1) == 100.0)
  }

  test("bucketed raster join matches the theta-join variant") {
    val base = Seq((0L, Seq(1.0, 2.0, 3.0, 4.0)), (1L, Seq(10.0, 20.0, 30.0, 40.0)),
      (2L, Seq(5.0, 5.0, 5.0, 5.0)))
      .toDF("k", "vals")
      .select($"k", rf_array_to_tile($"vals", 2, 2).as("tile"),
        struct(($"k" * 2).cast("double").as("xmin"), lit(0.0).as("ymin"),
          ($"k" * 2 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
    val rhs = base.select($"tile".as("r_tile"), $"extent".as("r_extent"), $"crs".as("r_crs"))
    val plain = RasterJoin(base, rhs,
      col("extent"), col("crs"), col("tile"),
      col("r_extent"), col("r_crs"), col("r_tile"))
      .select($"k", rf_tile_sum($"right_tile").as("s")).orderBy("k").collect()
    val bucketedR = RasterJoin.bucketed(base, rhs,
      col("extent"), col("crs"), col("tile"),
      col("r_extent"), col("r_crs"), col("r_tile"), cellSize = 0.7)
      .select($"k", rf_tile_sum($"right_tile").as("s")).orderBy("k").collect()
    assert(plain.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      bucketedR.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
