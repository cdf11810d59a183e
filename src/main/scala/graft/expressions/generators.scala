package graft.expressions

import graft.core._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * rf_explode_tiles: one output row per cell position across N aligned
 * tile columns: (column_index, row_index, cell_0…cell_{n−1}).
 *
 * A native Catalyst Generator, as in the reference
 * (/root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/generators/ExplodeTiles.scala:40-111);
 * built-in `explode` can't produce the multi-column zip with indices.
 * NoData cells are emitted as SQL NULL. `sampleFraction` < 1 keeps a
 * deterministic pseudo-random subset of cell positions (seeded).
 */
case class ExplodeTiles(
    children: Seq[Expression],
    sampleFraction: Double = 1.0,
    seed: Long = 42L)
    extends Expression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.nonEmpty && children.forall(c => isTileType(c.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("rf_explode_tiles expects tile arguments")

  override def elementSchema: StructType = {
    val cellFields = children.zipWithIndex.map {
      case (ne: NamedExpression, _) => StructField(ne.name, DoubleType, nullable = true)
      case (_, i) => StructField(s"cell_$i", DoubleType, nullable = true)
    }
    StructType(
      StructField("column_index", IntegerType, nullable = false) +:
      StructField("row_index", IntegerType, nullable = false) +:
      cellFields)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val tiles = children.map { c =>
      val v = c.eval(input)
      if (v == null) null else tileExtractor(c.dataType)(v)
    }
    val first = tiles.find(_ != null).orNull
    if (first == null) return Iterator.empty
    val cols = first.cols
    val rows = first.rows
    val nT = tiles.length
    val sampling = sampleFraction < 1.0
    val rng = if (sampling) new java.util.Random(seed) else null
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        if (!sampling || rng.nextDouble() <= sampleFraction) {
          val vals = new Array[Any](nT + 2)
          vals(0) = c
          vals(1) = r
          var k = 0
          while (k < nT) {
            val t = tiles(k)
            val v = if (t == null) Double.NaN else t.getDouble(r * cols + c)
            vals(k + 2) = if (NoData.isData(v)) v else null
            k += 1
          }
          out += new GenericInternalRow(vals)
        }
        c += 1
      }
      r += 1
    }
    out
  }

  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(children = cs)
}
