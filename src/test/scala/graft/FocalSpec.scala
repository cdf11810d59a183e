package graft

import graft.core.{CellType, Focal, Tile}
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FocalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("focal min/max/mean on 3x3 with NoData") {
    val t = Tile.fromDoubles(Array(1, 2, 3, 4, Double.NaN, 6, 7, 8, 9), CellType.float64, 3, 3)
    val mx = Focal.max(t, Focal.Square(1))
    assert(mx.getDouble(1, 1) == 9.0)
    assert(mx.getDouble(0, 0) == 4.0) // window clipped at edge; nodata skipped
    val mn = Focal.mean(t, Focal.Square(1))
    assert(mn.getDouble(1, 1) == 40.0 / 8) // 8 data neighbors incl corners, nodata center skipped
  }

  test("slope of a unit-gradient ramp is 45 degrees") {
    // z = x → dz/dx = 1 with cell size 1 → slope 45°
    val vals = Array.tabulate(25)(i => (i % 5).toDouble)
    val t = Tile.fromDoubles(vals, CellType.float64, 5, 5)
    val s = Focal.slope(t, 1.0, 1.0, 1.0)
    assert(math.abs(s.getDouble(2, 2) - 45.0) < 1e-9)
    val a = Focal.aspect(t, 1.0, 1.0)
    // Downslope faces west (270°) for z increasing to the east
    assert(math.abs(a.getDouble(2, 2) - 270.0) < 1e-9)
  }

  test("hillshade of flat terrain is uniform sin(altitude)") {
    val t = Tile.fromDoubles(Array.fill(25)(7.0), CellType.float64, 5, 5)
    val h = Focal.hillshade(t, 1.0, 1.0, 315.0, 45.0, 1.0)
    val expected = math.rint(255.0 * math.sin(math.toRadians(45.0)))
    assert(h.getDouble(2, 2) == expected)
  }

  test("median and mode") {
    val t = Tile.fromDoubles(Array(1, 1, 2, 3, 5, 8, 9, 9, 9), CellType.float64, 3, 3)
    assert(Focal.median(t, Focal.Square(1)).getDouble(1, 1) == 5.0)
    assert(Focal.mode(t, Focal.Square(1)).getDouble(1, 1) == 9.0)
  }

  test("convolve identity kernel") {
    val t = Tile.fromDoubles(Array(1, 2, 3, 4), CellType.float64, 2, 2)
    val k = Array(0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    val c = Focal.convolve(t, k, 3)
    assert(c.toArrayDouble.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("SQL surface: focal over assembled tile") {
    val df = Seq((1, Seq(1.0, 2.0, 3.0, 4.0))).toDF("id", "a")
      .select(rf_array_to_tile($"a", 2, 2).as("t"))
    val r = df.select(
      rf_tile_to_array_double(rf_focal_max($"t", "square-1")).as("m")).collect()(0)
    assert(r.getSeq[Double](0) == Seq(4.0, 4.0, 4.0, 4.0))
  }
}
