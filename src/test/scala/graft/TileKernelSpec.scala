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
}
