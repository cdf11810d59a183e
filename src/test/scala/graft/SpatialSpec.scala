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

  test("raster join resampleMethod: bilinear on an aligned grid is identity, " +
      "twins stay row-identical, half-res RHS interpolates") {
    val base = Seq((0L, Seq(1.0, 2.0, 3.0, 4.0)), (1L, Seq(10.0, 20.0, 30.0, 40.0)))
      .toDF("k", "vals")
      .select($"k", rf_array_to_tile($"vals", 2, 2).as("tile"),
        struct(($"k" * 2).cast("double").as("xmin"), lit(0.0).as("ymin"),
          ($"k" * 2 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
    val rhs = base.select($"tile".as("r_tile"), $"extent".as("r_extent"), $"crs".as("r_crs"))
    // aligned same-resolution grids: every dest center hits a source
    // center, so bilinear weights collapse to (1,0,0,0) = nearest
    def cellsOf(df: org.apache.spark.sql.DataFrame) = df
      .select($"k", rf_explode_tiles($"right_tile"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).sortBy(t => (t._1, t._3, t._2))
    val nearestR = RasterJoin(base, rhs, col("extent"), col("crs"), col("tile"),
      col("r_extent"), col("r_crs"), col("r_tile"))
    val bilinearR = RasterJoin(base, rhs, col("extent"), col("crs"), col("tile"),
      col("r_extent"), col("r_crs"), col("r_tile"), method = "bilinear")
    assert(cellsOf(nearestR).sameElements(cellsOf(bilinearR)))
    // bucketed twin is row-identical under a non-default method too
    val bucketedBil = RasterJoin.bucketed(base, rhs, col("extent"), col("crs"), col("tile"),
      col("r_extent"), col("r_crs"), col("r_tile"), cellSize = 0.7, method = "bilinear")
    assert(cellsOf(bilinearR).sameElements(cellsOf(bucketedBil)))
    // a 1x1 RHS (average overview) merged onto the 2x2 grid: every dest
    // cell bilinear-samples the single source cell -> the block average
    val rhs1 = base.select(rf_resample($"tile", lit(0.5), "average").as("r_tile"),
      $"extent".as("r_extent"), $"crs".as("r_crs"))
    val merged = RasterJoin(base, rhs1, col("extent"), col("crs"), col("tile"),
      col("r_extent"), col("r_crs"), col("r_tile"), method = "bilinear")
    val cells = cellsOf(merged)
    assert(cells.filter(_._1 == 0L).forall(_._4 == 2.5))
    assert(cells.filter(_._1 == 1L).forall(_._4 == 25.0))
    // aggregate methods have no point-sample meaning in the merge
    intercept[org.apache.spark.SparkException] {
      RasterJoin(base, rhs, col("extent"), col("crs"), col("tile"),
        col("r_extent"), col("r_crs"), col("r_tile"), method = "average")
        .select(rf_tile_sum($"right_tile")).collect()
    }
  }

  test("HilbertIndex.xy2d matches the canonical curve and is a locality-preserving bijection") {
    import graft.expressions.HilbertIndex.xy2d
    // order 1: the U
    assert(xy2d(1, 0, 0) == 0 && xy2d(1, 0, 1) == 1 &&
      xy2d(1, 1, 1) == 2 && xy2d(1, 1, 0) == 3)
    // order 2: the classic 16-cell sequence
    val seq2 = Seq((0, 0), (1, 0), (1, 1), (0, 1), (0, 2), (0, 3), (1, 3), (1, 2),
      (2, 2), (2, 3), (3, 3), (3, 2), (3, 1), (2, 1), (2, 0), (3, 0))
    seq2.zipWithIndex.foreach { case ((x, y), d) =>
      assert(xy2d(2, x, y) == d, s"($x,$y)")
    }
    // order 5: bijection over all 1024 cells, and every consecutive
    // pair of curve positions is GRID-ADJACENT (|dx|+|dy| = 1) — the
    // locality property z-order lacks at quadrant seams
    val n = 1 << 5
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield xy2d(5, x, y) -> ((x, y))).toMap
    assert(byD.size == n * n && byD.keys.min == 0L && byD.keys.max == n * n - 1L)
    (1 until n * n).foreach { d =>
      val (ax, ay) = byD(d - 1L)
      val (bx, by) = byD(d.toLong)
      assert(math.abs(ax - bx) + math.abs(ay - by) == 1, s"jump at d=$d")
    }
  }

  test("rf_hilbert_index evaluates over geometry + CRS like rf_z2_index") {
    val df = Seq((0.0, 0.0), (10.0, 20.0)).toDF("x", "y")
    val out = df.select(rf_hilbert_index(st_makePoint($"x", $"y"),
        lit("epsg:4326")).as("h"))
      .collect().map(_.getLong(0))
    // pinned against the scalar kernel on the same lon/lat grid math
    def grid(lon: Double, lat: Double) = graft.expressions.HilbertIndex.xy2d(16,
      ((lon + 180.0) / 360.0 * 65535).toLong, ((lat + 90.0) / 180.0 * 65535).toLong)
    assert(out.toSeq == Seq(grid(0, 0), grid(10, 20)))
  }
}

/** Edge cases of the round-8 spark-jts long-tail additions that the
  * q_st_breadth3 / q_st_sphere oracles can't reach (nulls, out-of-range
  * indices, multi-part closure, SQL-surface parity). */
class SpatialLongTailSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def one(expr: org.apache.spark.sql.Column) =
    Seq(1).toDF("x").select(expr).collect()(0)

  test("geometryn / interiorringn / pointn out-of-range give NULL") {
    val mp = st_geomFromWKT(lit("MULTIPOINT ((0 0), (1 0))"))
    assert(one(st_geometryN(mp, lit(3))).isNullAt(0))
    assert(one(st_geometryN(mp, lit(0))).isNullAt(0))
    val poly = st_geomFromWKT(lit("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))"))
    assert(one(st_interiorRingN(poly, lit(1))).isNullAt(0))
    // non-polygon input
    assert(one(st_interiorRingN(mp, lit(1))).isNullAt(0))
  }

  test("isclosed on multilines; isring NULL for non-lines") {
    val closedMl = st_geomFromWKT(
      lit("MULTILINESTRING ((0 0, 1 0, 1 1, 0 0), (5 5, 6 5, 6 6, 5 5))"))
    val openMl = st_geomFromWKT(
      lit("MULTILINESTRING ((0 0, 1 0, 1 1, 0 0), (5 5, 6 5))"))
    assert(one(st_isClosed(closedMl)).getBoolean(0))
    assert(!one(st_isClosed(openMl)).getBoolean(0))
    // point/polygon answer true by convention
    assert(one(st_isClosed(st_makePoint(lit(1.0), lit(2.0)))).getBoolean(0))
    assert(one(st_isRing(st_makePoint(lit(1.0), lit(2.0)))).isNullAt(0))
    // self-intersecting bowtie line: closed but not simple => not a ring
    val bowtie = st_geomFromWKT(lit("LINESTRING (0 0, 2 2, 2 0, 0 2, 0 0)"))
    assert(one(st_isClosed(bowtie)).getBoolean(0))
    assert(!one(st_isRing(bowtie)).getBoolean(0))
    assert(!one(st_isSimple(bowtie)).getBoolean(0))
  }

  test("casts: wrong type is NULL, right type round-trips") {
    val p = st_makePoint(lit(3.0), lit(4.0))
    assert(one(st_castToPolygon(p)).isNullAt(0))
    assert(one(st_x(st_castToPoint(p))).getDouble(0) == 3.0)
    assert(one(st_geometryType(st_castToGeometry(p))).getString(0) == "Point")
  }

  test("boundary shapes: polygon ring, line endpoints, point empty") {
    val poly = st_geomFromWKT(lit("POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))"))
    assert(one(st_length(st_boundary(poly))).getDouble(0) == 14.0)
    val line = st_geomFromWKT(lit("LINESTRING (0 0, 5 0)"))
    assert(one(st_numGeometries(st_boundary(line))).getInt(0) == 2)
    assert(one(st_isEmpty(st_boundary(st_makePoint(lit(0.0), lit(0.0))))).getBoolean(0))
  }

  test("geojson nested shapes: polygon with hole, multipoint, collection") {
    val donut = st_geomFromWKT(
      lit("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"))
    val gj = one(st_asGeoJSON(donut)).getString(0)
    assert(gj.startsWith("""{"type":"Polygon","coordinates":[[[0.0,0.0],"""))
    assert(gj.contains("""],[[1.0,1.0],"""))
    val mp = one(st_asGeoJSON(st_geomFromWKT(lit("MULTIPOINT ((0 0), (1 2))")))).getString(0)
    assert(mp == """{"type":"MultiPoint","coordinates":[[0.0,0.0],[1.0,2.0]]}""")
  }

  test("relate is order-sensitive; relatebool wildcards") {
    val poly = st_geomFromWKT(lit("POLYGON ((0 0, 9 0, 9 9, 0 9, 0 0))"))
    val p = st_makePoint(lit(3.0), lit(3.0))
    assert(one(st_relate(p, poly)).getString(0) == "0FFFFF212")
    assert(one(st_relate(poly, p)).getString(0) == "0F2FF1FF2")
    assert(one(st_relateBool(p, poly, lit("*********"))).getBoolean(0))
    assert(!one(st_relateBool(p, poly, lit("FFFFFFFFF"))).getBoolean(0))
  }

  test("distancesphere symmetry and a known meridian arc") {
    // one degree of latitude along a meridian on the IUGG sphere:
    // 2*pi*R/360 = 111194.92664… m
    val a = st_makePoint(lit(10.0), lit(45.0))
    val b = st_makePoint(lit(10.0), lit(46.0))
    val d1 = one(st_distanceSphere(a, b)).getDouble(0)
    val d2 = one(st_distanceSphere(b, a)).getDouble(0)
    assert(d1 == d2)
    assert(math.abs(d1 - 2 * math.Pi * 6371008.7714 / 360.0) < 1e-6)
    // lengthsphere of the 2-point line equals the point distance
    val l = one(st_lengthSphere(st_makeLine(array(a, b)))).getDouble(0)
    assert(l == d1)
  }

  test("new names resolve through SQL with docs") {
    val names = Seq("st_boundary", "st_geometryn", "st_makebox2d",
      "st_distancesphere", "st_relatebool", "st_asgeojson")
    for (n <- names) {
      val doc = spark.sql(s"DESCRIBE FUNCTION EXTENDED $n")
        .collect().map(_.getString(0)).mkString("\n")
      assert(doc.contains(n), s"$n missing from DESCRIBE output")
    }
    val r = spark.sql(
      """SELECT st_relate(st_point(1.0, 1.0),
        |  st_makebox2d(st_point(0.0, 0.0), st_point(2.0, 2.0)))""".stripMargin)
      .collect()(0).getString(0)
    assert(r == "0FFFFF212")
  }
}

/** Batch-2 long-tail edges: geohash reference vectors, bufferpoint
  * geodesic radius, antimeridian splitting in both coordinate styles. */
class SpatialGeohashSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def one(expr: org.apache.spark.sql.Column) =
    Seq(1).toDF("x").select(expr).collect()(0)

  test("geohash matches the published reference vector") {
    // the canonical example from the public geohash spec
    assert(graft.expressions.Geohash.encode(-5.6, 42.6, 5) == "ezs42")
    assert(graft.expressions.Geohash.encode(-5.603027, 42.604980, 5) == "ezs42")
    val gh = one(st_geoHash(st_makePoint(lit(-5.6), lit(42.6)), lit(5))).getString(0)
    assert(gh == "ezs42")
  }

  test("geohash decode brackets the encoded point, center halves the cell") {
    val (lomn, lamn, lomx, lamx) = graft.expressions.Geohash.decodeBounds("ezs42")
    assert(lomn <= -5.6 && -5.6 < lomx && lamn <= 42.6 && 42.6 < lamx)
    // 5 chars = 25 bits: 13 lon, 12 lat
    assert(lomx - lomn == 360.0 / math.pow(2, 13))
    assert(lamx - lamn == 180.0 / math.pow(2, 12))
    val r = one(struct(
      st_x(st_pointFromGeoHash(lit("ezs42"))),
      st_y(st_pointFromGeoHash(lit("ezs42"))))).getStruct(0)
    assert(r.getDouble(0) == (lomn + lomx) / 2 && r.getDouble(1) == (lamn + lamx) / 2)
  }

  test("geohash rejects bad precision and bad chars") {
    intercept[Exception] {
      one(st_geoHash(st_makePoint(lit(0.0), lit(0.0)), lit(13)))
    }
    intercept[Exception] { one(st_geomFromGeoHash(lit("ab!c"))) }
  }

  test("bufferpoint vertices sit at the requested great-circle radius") {
    val df = Seq(1).toDF("x").select(
      st_bufferPoint(st_makePoint(lit(10.0), lit(45.0)), lit(75000.0)).as("bp"))
    val poly = df.collect()(0).getAs[org.locationtech.jts.geom.Geometry](0)
    val coords = poly.getCoordinates
    assert(coords.length == 65)
    for (c <- coords) {
      val d = graft.expressions.Sphere.haversineM(10.0, 45.0, c.x, c.y)
      assert(math.abs(d - 75000.0) < 1e-4, s"vertex at $d m")
    }
  }

  test("antimeridian split: unwrapped and standard-range crossings") {
    // unwrapped: 170..190
    val un = one(st_numGeometries(st_antimeridianSafeGeom(
      st_geomFromWKT(lit("POLYGON ((170 0, 190 0, 190 5, 170 5, 170 0))"))))).getInt(0)
    assert(un == 2)
    // standard range: -175..175 spanning the line (width 350 > 180)
    val std = st_antimeridianSafeGeom(st_geomFromWKT(
      lit("POLYGON ((175 0, 185 0, 185 5, 175 5, 175 0))")))
    val stdWrapped = st_antimeridianSafeGeom(st_geomFromWKT(
      lit("MULTIPOLYGON (((175 0, 180 0, 180 5, 175 5, 175 0)))")))
    assert(one(st_numGeometries(std)).getInt(0) == 2)
    assert(one(st_area(std)).getDouble(0) == 50.0)
    // touching 180 exactly but not crossing stays one part
    assert(one(st_numGeometries(stdWrapped)).getInt(0) == 1)
    // non-crossing geometry is unchanged
    val same = one(st_asText(st_antimeridianSafeGeom(
      st_geomFromWKT(lit("POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))"))))).getString(0)
    assert(same == "POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0))")
  }

  test("wkt typed parsers: matching type round-trips, mismatch is NULL") {
    assert(one(st_x(st_pointFromText(lit("POINT (3 4)")))).getDouble(0) == 3.0)
    assert(one(st_pointFromText(lit("LINESTRING (0 0, 1 1)"))).isNullAt(0))
    assert(one(st_length(st_lineFromText(lit("LINESTRING (0 0, 3 4)")))).getDouble(0) == 5.0)
    assert(one(st_polygonFromText(lit("POINT (1 2)"))).isNullAt(0))
    assert(one(st_area(st_makeBBOX(lit(1.0), lit(2.0), lit(4.0), lit(6.0)))).getDouble(0) == 12.0)
  }
}

/** Batch-3 long-tail: topological equality, MULTI* WKT parsers, measure
  * points, and the WGS84 Vincenty pair against the published vector. */
class SpatialSpheroidSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def one(expr: org.apache.spark.sql.Column) =
    Seq(1).toDF("x").select(expr).collect()(0)

  test("vincenty matches the published Flinders Peak - Buninyong line") {
    // the canonical Vincenty inverse test line (Geoscience Australia):
    // ellipsoidal distance 54 972.271 m
    val d = graft.expressions.Spheroid.vincentyM(
      144.42486788888888, -37.95103341666667,
      143.92649552777777, -37.65282113888889)
    assert(math.abs(d - 54972.271) < 5e-3, s"got $d")
    val viaSql = one(st_distanceSpheroid(
      st_makePoint(lit(144.42486788888888), lit(-37.95103341666667)),
      st_makePoint(lit(143.92649552777777), lit(-37.65282113888889)))).getDouble(0)
    assert(viaSql == d)
  }

  test("vincenty is symmetric, zero for identical points, near-sphere for short arcs") {
    val ab = graft.expressions.Spheroid.vincentyM(10.0, 45.0, 11.0, 46.0)
    val ba = graft.expressions.Spheroid.vincentyM(11.0, 46.0, 10.0, 45.0)
    assert(math.abs(ab - ba) < 1e-6)
    assert(graft.expressions.Spheroid.vincentyM(5.0, 5.0, 5.0, 5.0) == 0.0)
    // ellipsoidal vs spherical should agree within ~0.6%
    val sph = graft.expressions.Sphere.haversineM(10.0, 45.0, 11.0, 46.0)
    assert(math.abs(ab - sph) / sph < 0.006)
  }

  test("lengthspheroid sums segments; non-line is 0") {
    val seg1 = graft.expressions.Spheroid.vincentyM(0.0, 0.0, 1.0, 0.0)
    val seg2 = graft.expressions.Spheroid.vincentyM(1.0, 0.0, 1.0, 1.0)
    val len = one(st_lengthSpheroid(st_geomFromWKT(
      lit("LINESTRING (0 0, 1 0, 1 1)")))).getDouble(0)
    assert(len == seg1 + seg2)
    assert(one(st_lengthSpheroid(st_makePoint(lit(1.0), lit(2.0)))).getDouble(0) == 0.0)
  }

  test("st_equals is topological; multi parsers type-check; makepointm carries M") {
    assert(one(st_equals(
      st_geomFromWKT(lit("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")),
      st_geomFromWKT(lit("POLYGON ((2 2, 0 2, 0 0, 2 0, 2 2))")))).getBoolean(0))
    assert(!one(st_equals(
      st_makePoint(lit(1.0), lit(2.0)), st_makePoint(lit(1.0), lit(3.0)))).getBoolean(0))
    assert(one(st_numGeometries(st_mPointFromText(
      lit("MULTIPOINT ((1 2), (3 4))")))).getInt(0) == 2)
    assert(one(st_mPointFromText(lit("POINT (1 2)"))).isNullAt(0))
    assert(one(st_length(st_mLineFromText(
      lit("MULTILINESTRING ((0 0, 3 4), (0 0, 0 1))")))).getDouble(0) == 6.0)
    assert(one(st_area(st_mPolyFromText(
      lit("MULTIPOLYGON (((0 0, 2 0, 2 3, 0 3, 0 0)))")))).getDouble(0) == 6.0)
    val pm = one(st_makePointM(lit(3.0), lit(4.0), lit(9.5)))
      .getAs[org.locationtech.jts.geom.Geometry](0)
    assert(pm.getCoordinate.getX == 3.0 && pm.getCoordinate.getY == 4.0 &&
      pm.getCoordinate.getM == 9.5)
  }
}
