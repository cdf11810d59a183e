package graft.tools
import org.apache.spark.sql.SparkSession
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    def probe(name: String, sql: String): Unit =
      try { val r = spark.sql(sql).collect(); println(s"[$name] OK -> ${r.headOption}") }
      catch { case e: Throwable =>
        var c: Throwable = e; while (c.getCause != null) c = c.getCause
        println(s"[$name] ${c.getClass.getSimpleName}: ${Option(c.getMessage).map(_.linesIterator.next()).getOrElse("")}") }
    probe("unsupported crs", "SELECT st_x(st_reproject(st_makepoint(1.0, 2.0), 'epsg:4326', 'epsg:9999'))")
    probe("bad wkt", "SELECT st_area(st_geomfromwkt('POLYGON bogus'))")
    probe("degenerate box intersects", "SELECT st_intersects(st_makepoint(1.0,1.0), st_makepoint(1.0,1.0))")
    probe("xz2 world box", "SELECT rf_xz2_index(st_geomfromwkt('POLYGON ((-180 -90, 180 -90, 180 90, -180 90, -180 -90))'), 'epsg:4326')")
    probe("rasterize degenerate line", "SELECT rf_data_cells(rf_rasterize(st_geomfromwkt('LINESTRING (0 0, 4 0)'), st_geomfromwkt('POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))'), 1.0, 8, 8))")
    spark.stop()
  }
}
