package graft.tools
import org.apache.spark.sql.SparkSession
object Probe3 {
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
    val mk = "rf_make_constant_tile(5.0, 4, 4, 'float64')"
    probe("garbage neighborhood", s"SELECT rf_tile_sum(rf_focal_mean($mk, 'pentagon-99'))")
    probe("even kernel", s"SELECT rf_convolve($mk, array(1.0, 1.0, 1.0, 1.0))")
    probe("radius 0", s"SELECT rf_tile_sum(rf_focal_max($mk, '0'))")
    probe("slope on bare tile (cellsize 1)", s"SELECT rf_tile_max(rf_slope($mk, 1.0))")
    spark.stop()
  }
}
