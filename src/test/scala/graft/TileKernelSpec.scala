package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class TileKernelSpec extends AnyFunSuite {
  test("cell type parse round-trip") {
    val names = Seq("bool", "int8", "int8raw", "uint8", "uint16ud255",
      "int16", "int32", "float32", "float64", "float64raw", "int32ud-99")
    for (n <- names) assert(CellType.fromName(n).name == n)
  }

  test("uint16ud255 nodata semantics") {
    val ct = CellType.fromName("uint16ud255")
    val t = Tile.empty(ct, 4, 4)
    assert(t.isNoDataTile)
    t.setDouble(0, 10.0)
    t.setDouble(1, 255.0) // the sentinel: writing it is indistinguishable from NoData
    assert(t.getDouble(0) == 10.0)
    assert(NoData.isNoData(t.getDouble(1)))
    assert(t.dataCells == 1)
  }

  test("int tiles round-trip through bytes") {
    for (name <- Seq("int8", "uint8", "int16", "uint16", "int32", "float32", "float64")) {
      val ct = CellType.fromName(name)
      val t = Tile.empty(ct, 3, 2)
      t.setDouble(0, 1); t.setDouble(1, 2); t.setDouble(5, 100)
      val rt = Tile.fromBytes(t.toBytes, ct, 3, 2)
      assert(rt.toArrayDouble.toSeq.zip(t.toArrayDouble.toSeq).forall {
        case (a, b) => (a == b) || (a.isNaN && b.isNaN)
      }, s"round-trip failed for $name")
    }
  }

  test("bit tile") {
    val t = Tile.empty(CellType.bool, 8, 2)
    t.setDouble(3, 1.0); t.setDouble(9, 1.0)
    assert(t.getDouble(3) == 1.0 && t.getDouble(9) == 1.0 && t.getDouble(0) == 0.0)
    assert(t.sum == 2.0)
    val rt = Tile.fromBytes(t.toBytes, CellType.bool, 8, 2)
    assert(rt.getDouble(9) == 1.0)
  }

  test("stats skip NoData") {
    val t = Tile.empty(CellType.float64, 2, 2)
    t.setDouble(0, 1); t.setDouble(1, 3)
    assert(t.dataCells == 2 && t.noDataCells == 2)
    assert(t.sum == 4.0 && t.mean == 2.0 && t.minCell == 1.0 && t.maxCell == 3.0)
  }

  test("combine with union cell type and NoData propagation") {
    val a = Tile.empty(CellType.uint8, 2, 1); a.setDouble(0, 10); a.setDouble(1, 20)
    val b = Tile.empty(CellType.float64, 2, 1); b.setDouble(0, 0.5)
    val c = a.combineDouble(b)(_ + _)
    assert(c.cellType.base == CellBase.Float64)
    assert(c.getDouble(0) == 10.5)
    assert(NoData.isNoData(c.getDouble(1)))
  }

  test("convert clamps and rounds to integral types") {
    val t = Tile.empty(CellType.float64, 2, 1)
    t.setDouble(0, 3.6)
    val i = t.convert(CellType.int32)
    assert(i.getDouble(0) == 4.0)
    assert(NoData.isNoData(i.getDouble(1)))
    // narrowing saturates instead of wrapping
    val big = Tile.empty(CellType.float64, 3, 1)
    big.setDouble(0, 300.0); big.setDouble(1, -5.0); big.setDouble(2, 70000.0)
    val u8 = big.convert(CellType.uint8)
    assert(u8.getDouble(0) == 255.0, "300 → uint8 saturates to 255")
    assert(u8.getDouble(1) == 1.0, "-5 → uint8 saturates to min data value")
    val u16 = big.convert(CellType.uint16)
    assert(u16.getDouble(2) == 65535.0, "70000 → uint16 saturates")
  }

  test("withNoData reinterprets sentinel") {
    val t = Tile.empty(CellType.float64raw, 3, 1)
    t.setDouble(0, 50); t.setDouble(1, 7); t.setDouble(2, 50)
    val nd = t.withNoData(50)
    assert(nd.dataCells == 1)
    assert(nd.getDouble(1) == 7.0)
  }

  private def dense84(): MutableTile = {
    val t = Tile.empty(CellType.float64, 8, 4)
    var i = 0; while (i < 32) { t.setDouble(i, (i * 7 % 13 + 1).toDouble); i += 1 }
    t
  }

  test("cubic convolution at factor 0.5 matches the flat Keys-weight sum exactly") {
    val t = dense84()
    val out = Resample(t, 4, 2, "cubic_convolution")
    // at fx=fy=0.5 the Keys a=-0.5 taps are exact dyadics: -1/16, 9/16
    val w = Map(-1 -> -0.0625, 0 -> 0.5625, 1 -> 0.5625, 2 -> -0.0625)
    for (dr <- 0 until 2; dc <- 0 until 4) {
      var exp = 0.0
      for (i <- -1 to 2; j <- -1 to 2) {
        val sr = math.max(0, math.min(3, 2 * dr + i))
        val sc = math.max(0, math.min(7, 2 * dc + j))
        exp += w(i) * w(j) * t.getDouble(sr * 8 + sc)
      }
      assert(out.getDouble(dr * 4 + dc) == exp, s"cell ($dc,$dr)")
    }
  }

  test("cubic/spline/lanczos preserve a constant tile and interpolate between kernels") {
    val t = Tile.empty(CellType.float64, 8, 4)
    (0 until 32).foreach(i => t.setDouble(i, 42.0))
    for (m <- Seq("cubic_convolution", "cubic_spline", "lanczos")) {
      val out = Resample(t, 4, 2, m)
      (0 until 8).foreach(i => assert(math.abs(out.getDouble(i) - 42.0) < 1e-9, m))
    }
    // spline smooths (weighted toward the window mean), cubic interpolates:
    // on a linear ramp both reproduce the linear value
    val ramp = Tile.empty(CellType.float64, 8, 4)
    (0 until 32).foreach(i => ramp.setDouble(i, (i % 8).toDouble))
    for (m <- Seq("cubic_convolution", "cubic_spline")) {
      val out = Resample(ramp, 4, 2, m)
      // dest col 1 samples x = 2.5 on the ramp → 2.5 (edge cells clamp, skip them)
      assert(math.abs(out.getDouble(1) - 2.5) < 1e-9, m)
      assert(math.abs(out.getDouble(2) - 4.5) < 1e-9, m)
    }
  }

  test("cubic window with a NoData hole falls back to bilinear") {
    val t = dense84()
    t.setDouble(0, Double.NaN) // corner hole poisons windows that reach it
    val cubic = Resample(t, 4, 2, "cubic_convolution")
    val bil = Resample(t, 4, 2, "bilinear")
    // dest (0,0)'s 4x4 window spans source cols -1..2 (clamped) rows -1..2 → includes (0,0)
    assert(cubic.getDouble(0) == bil.getDouble(0), "hole window = bilinear fallback")
    // dest (3,1)'s window spans cols 5..8→5..7, rows 1..3 → no hole → differs from bilinear path
    val w = Map(-1 -> -0.0625, 0 -> 0.5625, 1 -> 0.5625, 2 -> -0.0625)
    var exp = 0.0
    for (i <- -1 to 2; j <- -1 to 2) {
      val sr = math.max(0, math.min(3, 2 + i)); val sc = math.max(0, math.min(7, 6 + j))
      exp += w(i) * w(j) * t.getDouble(sr * 8 + sc)
    }
    assert(cubic.getDouble(7) == exp)
  }

  test("aggregate resample: avg/sum/min/max/median/mode block semantics") {
    // 4x2 → 2x1: blocks {1,3,2,8} and {5,5,7,NoData}
    val t = Tile.empty(CellType.float64, 4, 2)
    t.setDouble(0, 1); t.setDouble(1, 3); t.setDouble(4, 2); t.setDouble(5, 8)
    t.setDouble(2, 5); t.setDouble(3, 5); t.setDouble(6, 7) // (3,1) stays NoData
    def one(m: String) = Resample(t, 2, 1, m)
    assert(one("average").getDouble(0) == 3.5 && one("average").getDouble(1) == 17.0 / 3)
    assert(one("sum").getDouble(0) == 14.0 && one("sum").getDouble(1) == 17.0)
    assert(one("min").getDouble(0) == 1.0 && one("min").getDouble(1) == 5.0)
    assert(one("max").getDouble(0) == 8.0 && one("max").getDouble(1) == 7.0)
    // LOWER median: {1,2,3,8} → 2; {5,5,7} → 5
    assert(one("median").getDouble(0) == 2.0 && one("median").getDouble(1) == 5.0)
    // mode: all-distinct block ties → smallest (1); {5,5,7} → 5
    assert(one("mode").getDouble(0) == 1.0 && one("mode").getDouble(1) == 5.0)
    // avg/sum widen to float64; order-stat methods keep the source type
    val i8 = Tile.empty(CellType.fromName("int8"), 4, 2)
    (0 until 7).foreach(i => i8.setDouble(i, 100))
    assert(Resample(i8, 2, 1, "sum").cellType == CellType.float64, "sum must not wrap int8")
    assert(Resample(i8, 2, 1, "median").cellType.name == "int8")
    // an empty block (all NoData) is NoData
    val holes = Tile.empty(CellType.float64, 4, 2)
    holes.setDouble(0, 9)
    val avg = Resample(holes, 2, 1, "average")
    assert(avg.getDouble(0) == 9.0 && NoData.isNoData(avg.getDouble(1)))
  }

  test("resample method names: reference spellings accepted, unknown rejected") {
    val t = dense84()
    assert(Resample(t, 4, 2, "CubicConvolution").toArrayDouble.sameElements(
      Resample(t, 4, 2, "cubic_convolution").toArrayDouble))
    assert(Resample(t, 4, 2, "lanzos").toArrayDouble.sameElements( // ref typo alias
      Resample(t, 4, 2, "lanczos").toArrayDouble))
    intercept[IllegalArgumentException](Resample(t, 4, 2, "bicubic"))
  }
}
