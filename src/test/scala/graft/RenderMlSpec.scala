package graft

import graft.functions._
import graft.ml.{NoDataFilter, TileExploder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RenderMlSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def tiles = Seq((1, Seq[java.lang.Double](1.0, null, 3.0, 4.0)))
    .toDF("id", "a")
    .select($"id", rf_array_to_tile($"a", 2, 2).as("t"))

  test("render ascii/matrix/png") {
    val r = tiles.select(
      rf_render_ascii($"t"), rf_render_matrix($"t"), rf_render_png($"t")).collect()(0)
    assert(r.getString(0).linesIterator.size == 2)
    assert(r.getString(1).contains("--")) // NoData marker
    val png = r.getAs[Array[Byte]](2)
    assert(png.length > 8 && (png(1) & 0xff) == 'P'.toInt && (png(2) & 0xff) == 'N'.toInt)
  }

  test("rgb composite packs bands") {
    val r = tiles.select(rf_tile_max(rf_rgb_composite($"t", $"t", $"t")).as("mx")).collect()(0)
    assert(r.getDouble(0) == 0xffffff.toDouble)
  }

  test("TileExploder + NoDataFilter pipeline") {
    val exploded = new TileExploder().transform(tiles)
    assert(exploded.columns.toSeq == Seq("id", "column_index", "row_index", "t"))
    assert(exploded.count() == 4)
    val filtered = new NoDataFilter().setInputCols(Array("t")).transform(exploded)
    assert(filtered.count() == 3)
  }
}
