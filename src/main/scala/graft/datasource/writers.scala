package graft.datasource

import java.nio.file.{Files, Paths}

import graft.core._
import graft.core.crs.CRS
import graft.core.geotiff.GeoTiff
import graft.udt.TileUDT
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister}
import org.apache.spark.sql.types.StructType

/**
 * Write-side connectors (V1 CreatableRelationProvider, like the
 * reference's writers):
 *  - "tiles": one GeoTIFF per row + a catalog.csv
 *    (/root/reference/datasource/.../tiles/TilesDataSource.scala:47-230)
 *  - "geotiff": mosaic everything into ONE GeoTIFF on the driver —
 *    explicitly not big-data friendly, mirrored from
 *    (/root/reference/datasource/.../geotiff/GeoTiffDataSource.scala:61-102)
 *
 * Input contract: columns `tile` (TileUDT), `extent` (struct), `crs`
 * (string); extra columns are carried into the catalog.
 */
class TilesDataSource extends CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "tiles"
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException("tiles writer requires a 'path'"))
    Files.createDirectories(Paths.get(dir))
    val cols = data.columns
    val tileIdx = cols.indexOf("tile")
    val extIdx = cols.indexOf("extent")
    val crsIdx = cols.indexOf("crs")
    require(tileIdx >= 0 && extIdx >= 0 && crsIdx >= 0,
      "tiles writer requires 'tile', 'extent' and 'crs' columns")
    val otherCols = cols.zipWithIndex.filter { case (c, i) =>
      i != tileIdx && i != extIdx && i != crsIdx }
    // distributed write of tile files; small metadata returns to the driver
    val entries = data.rdd.mapPartitionsWithIndex { (pid, rows) =>
      rows.zipWithIndex.map { case (row, i) =>
        val tile = row.getAs[Tile](tileIdx)
        val e = row.getStruct(extIdx)
        val extent = Extent(e.getDouble(0), e.getDouble(1), e.getDouble(2), e.getDouble(3))
        val crs = CRS(row.getString(crsIdx))
        val name = f"tile-$pid%05d-$i%05d.tif"
        GeoTiff.write(s"$dir/$name", tile, extent, crs)
        (name +: otherCols.map { case (_, idx) => String.valueOf(row.get(idx)) })
          .mkString(",")
      }
    }.collect()
    val header = ("path" +: otherCols.map(_._1)).mkString(",")
    Files.write(Paths.get(s"$dir/catalog.csv"),
      (header +: entries).mkString("\n").getBytes("UTF-8"))
    val outerCtx = sqlContext
    new BaseRelation {
      override def sqlContext: SQLContext = outerCtx
      override def schema: StructType = data.schema
    }
  }
}

/** Mixed into [[GeoTiffDataSource]] so format("geotiff") reads AND writes. */
trait GeoTiffWriteSupport extends CreatableRelationProvider {
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("geotiff writer requires a 'path'"))
    val rows = data.select("tile", "extent", "crs").collect()
    require(rows.nonEmpty, "geotiff writer: empty input")
    val parts = rows.map { r =>
      val t = r.getAs[Tile](0)
      val e = r.getStruct(1)
      (t, Extent(e.getDouble(0), e.getDouble(1), e.getDouble(2), e.getDouble(3)), CRS(r.getString(2)))
    }
    val crs = parts.head._3
    val union = parts.map(_._2).reduce(_ combine _)
    val cw = parts.head._2.width / parts.head._1.cols
    val ch = parts.head._2.height / parts.head._1.rows
    val cols = math.max(1, math.round(union.width / cw).toInt)
    val rows2 = math.max(1, math.round(union.height / ch).toInt)
    val re = RasterExtent(union, cols, rows2)
    val out = Tile.empty(parts.head._1.cellType.withDefaultNoData, cols, rows2)
    for ((t, e, _) <- parts) {
      val gb = re.gridBoundsFor(e)
      val sub = RasterExtent(e, t.cols, t.rows)
      var r = gb.rowMin
      while (r <= gb.rowMax) {
        var c = gb.colMin
        while (c <= gb.colMax) {
          val x = re.colToX(c); val y = re.rowToY(r)
          val sc = sub.xToCol(x); val sr = sub.yToRow(y)
          if (sc >= 0 && sc < t.cols && sr >= 0 && sr < t.rows) {
            val v = t.getDouble(sr * t.cols + sc)
            if (NoData.isData(v)) out.setDouble(r * cols + c, v)
          }
          c += 1
        }
        r += 1
      }
    }
    GeoTiff.write(path, out, union, crs)
    val outerCtx = sqlContext
    new BaseRelation {
      override def sqlContext: SQLContext = outerCtx
      override def schema: StructType = data.schema
    }
  }
}
