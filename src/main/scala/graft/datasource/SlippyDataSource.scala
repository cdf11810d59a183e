package graft.datasource

import java.nio.file.{Files, Paths}

import graft.core._
import graft.core.crs.CRS
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister}
import org.apache.spark.sql.types.StructType

/**
 * Slippy-map (z/x/y PNG pyramid) writer + HTML viewer (reference:
 * /root/reference/datasource/src/main/scala/org/locationtech/rasterframes/datasource/slippy/SlippyDataSource.scala:17-67).
 * Each input row's tile is resampled to the 256² slippy tile(s) its
 * footprint covers at the chosen zoom; distributed `foreachPartition`
 * write, no driver collect. Options: `path`, `zoom` (default 4).
 * Input: `tile`, `extent`, `crs` columns (extent in the row's CRS).
 */
class SlippyDataSource extends CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "slippy"

  override def createRelation(ctx: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val dir = parameters.getOrElse("path",
      throw new IllegalArgumentException("slippy writer requires a 'path'"))
    val zoom = parameters.getOrElse("zoom", "4").toInt
    Files.createDirectories(Paths.get(dir))
    val n = 1 << zoom

    def lonLatToTile(lon: Double, lat: Double): (Int, Int) = {
      val x = ((lon + 180.0) / 360.0 * n).toInt.max(0).min(n - 1)
      val latR = math.toRadians(lat)
      val y = ((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n)
        .toInt.max(0).min(n - 1)
      (x, y)
    }
    def tileBounds(x: Int, y: Int): Extent = { // in lon/lat
      def lon(i: Int) = i.toDouble / n * 360.0 - 180.0
      def lat(i: Int) = math.toDegrees(math.atan(math.sinh(math.Pi * (1 - 2.0 * i / n))))
      Extent(lon(x), lat(y + 1), lon(x + 1), lat(y))
    }

    val rows = data.select("tile", "extent", "crs")
    rows.rdd.foreachPartition { it =>
      it.foreach { row =>
        val t = row.getAs[Tile](0)
        val e = row.getStruct(1)
        val extent = Extent(e.getDouble(0), e.getDouble(1), e.getDouble(2), e.getDouble(3))
        val crs = CRS(row.getString(2))
        val (lon0, lat0) = CRS.toLonLat(extent.xmin, extent.ymin, crs)
        val (lon1, lat1) = CRS.toLonLat(extent.xmax, extent.ymax, crs)
        val (tx0, ty1) = lonLatToTile(lon0, lat0)
        val (tx1, ty0) = lonLatToTile(lon1, lat1)
        val srcRE = RasterExtent(Extent(lon0, lat0, lon1, lat1), t.cols, t.rows)
        val (_, _, mn, mx, _, _) = t.statsAccum
        val range = if (mx > mn) mx - mn else 1.0
        for (tx <- tx0 to tx1; ty <- ty0 to ty1) {
          val tb = tileBounds(tx, ty)
          val img = new java.awt.image.BufferedImage(256, 256,
            java.awt.image.BufferedImage.TYPE_INT_ARGB)
          val re = RasterExtent(tb, 256, 256)
          var any = false
          var r = 0
          while (r < 256) {
            var c = 0
            while (c < 256) {
              val x = re.colToX(c); val y = re.rowToY(r)
              val sc = srcRE.xToCol(x); val sr = srcRE.yToRow(y)
              if (sc >= 0 && sc < t.cols && sr >= 0 && sr < t.rows) {
                val v = t.getDouble(sr * t.cols + sc)
                if (NoData.isData(v)) {
                  val g = ((v - mn) / range * 255).toInt & 0xff
                  img.setRGB(c, r, 0xff000000 | (g << 16) | (g << 8) | g)
                  any = true
                }
              }
              c += 1
            }
            r += 1
          }
          if (any) {
            val p = Paths.get(dir, zoom.toString, tx.toString)
            Files.createDirectories(p)
            javax.imageio.ImageIO.write(img, "png", p.resolve(s"$ty.png").toFile)
          }
        }
      }
    }
    Files.write(Paths.get(dir, "index.html"),
      s"""<!doctype html><html><body><h3>graft slippy layer (zoom $zoom)</h3>
         |<p>Tiles under $zoom/{x}/{y}.png — point any slippy-map client at this directory.</p>
         |</body></html>""".stripMargin.getBytes("UTF-8"))
    val outerCtx = ctx
    new BaseRelation {
      override def sqlContext: SQLContext = outerCtx
      override def schema: StructType = data.schema
    }
  }
}
