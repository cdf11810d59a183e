package graft

import graft.core._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests for the NoData semantics (SURVEY.md §7.4 hard part #1):
 * every kernel must skip/propagate NoData identically across all cell
 * types, and serialization must be lossless for representable values.
 */
class NoDataPropertySpec extends AnyFunSuite {
  /** deterministic sampling (scalatest-scalacheck bridge is not on the
    * offline classpath; raw scalacheck Gens with fixed seeds) */
  def forAll[A](g: Gen[A], n: Int = 60)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  val cellTypes: Seq[CellType] = Seq(
    CellType.uint8, CellType.int8, CellType.int16, CellType.uint16,
    CellType.int32, CellType.float32, CellType.float64,
    CellType.fromName("uint16ud255"), CellType.fromName("int32ud-99"),
    CellType.float64raw)

  /** values representable in every tested cell type's data range */
  val cellValue: Gen[Double] = Gen.choose(1, 100).map(_.toDouble)
  val maybeValue: Gen[Option[Double]] = Gen.option(cellValue)

  def mkTile(ct: CellType, vals: Seq[Option[Double]]): Tile = {
    val t = Tile.empty(ct, vals.length, 1)
    vals.zipWithIndex.foreach {
      case (Some(v), i) => t.setDouble(i, v)
      case (None, i) => t.setDouble(i, Double.NaN)
    }
    t
  }

  test("sum/count/min/max skip NoData for every cell type") {
    forAll(Gen.listOfN(16, maybeValue)) { vals =>
      if (vals.nonEmpty) {
        for (ct <- cellTypes) {
          // ud sentinels: writing the sentinel value itself is indistinguishable
          // from NoData, so exclude those positions from the expectation
          val expectData = vals.flatten.filterNot(v => ct.hasNoData && ct.isNoData(v))
          val t = mkTile(ct, vals)
          val canHoldNoData = ct.hasNoData
          if (canHoldNoData || vals.forall(_.isDefined)) {
            assert(t.dataCells == expectData.size, s"${ct.name} dataCells")
            assert(t.sum == expectData.sum, s"${ct.name} sum")
            if (expectData.nonEmpty) {
              assert(t.minCell == expectData.min, s"${ct.name} min")
              assert(t.maxCell == expectData.max, s"${ct.name} max")
            }
          }
        }
      }
    }
  }

  test("byte serialization round-trips for every cell type") {
    forAll(Gen.listOfN(12, maybeValue)) { vals =>
      for (ct <- cellTypes) {
        val t = mkTile(ct, vals)
        val rt = Tile.fromBytes(t.toBytes, ct, t.cols, t.rows)
        (0 until t.size).foreach { i =>
          val a = t.getDouble(i); val b = rt.getDouble(i)
          assert((a.isNaN && b.isNaN) || a == b, s"${ct.name} cell $i: $a vs $b")
        }
      }
    }
  }

  test("combine propagates NoData and matches scalar op") {
    forAll(Gen.zip(Gen.listOfN(8, maybeValue), Gen.listOfN(8, maybeValue))) { case (va, vb) =>
      for (ct <- Seq(CellType.float64, CellType.int32, CellType.uint16)) {
        val a = mkTile(ct, va)
        val b = mkTile(ct, vb)
        val c = a.combineDouble(b)(_ + _)
        (0 until a.size).foreach { i =>
          val x = a.getDouble(i); val y = b.getDouble(i)
          val z = c.getDouble(i)
          if (NoData.isData(x) && NoData.isData(y)) assert(z == x + y, s"${ct.name}")
          else assert(NoData.isNoData(z), s"${ct.name} NoData propagation")
        }
      }
    }
  }

  test("convert preserves values within range across type pairs") {
    forAll(Gen.listOfN(8, cellValue)) { vals =>
      for (src <- cellTypes; dst <- Seq(CellType.float64, CellType.int32, CellType.uint16)) {
        val t = mkTile(src, vals.map(Some(_)))
        val conv = t.convert(dst)
        (0 until t.size).foreach { i =>
          val orig = t.getDouble(i)
          if (NoData.isData(orig) && !dst.isNoData(orig))
            assert(conv.getDouble(i) == orig, s"${src.name}->${dst.name}")
        }
      }
    }
  }
}
