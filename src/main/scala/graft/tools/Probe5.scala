package graft.tools
import org.apache.spark.sql.SparkSession
object Probe5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    def p(name: String)(body: => Unit): Unit =
      try { body; println(s"[$name] OK") } catch { case e: Throwable =>
        var c: Throwable = e; while (c.getCause != null) c = c.getCause
        println(s"[$name] ${c.getClass.getSimpleName}: ${Option(c.getMessage).map(_.linesIterator.next()).getOrElse("")}") }
    val dir = java.nio.file.Files.createTempDirectory("p5").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/nf.geojson"),
      """{"type":"FeatureCollection"}""".getBytes)
    p("missing features") { spark.read.format("geojson").option("path", s"$dir/nf.geojson").load().collect() }
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/circ.geojson"),
      """{"type":"FeatureCollection","features":[{"type":"Feature","geometry":{"type":"Circle","coordinates":[0,0]},"properties":{}}]}""".getBytes)
    p("unsupported geom type") { spark.read.format("geojson").option("path", s"$dir/circ.geojson").load().collect() }
    // read a valid one through SQL: st_geomfromgeojson
    p("sql st_geomfromgeojson") {
      val r = spark.sql("""SELECT st_astext(st_geomfromgeojson('{"type":"Point","coordinates":[3,4]}'))""").collect()(0).getString(0)
      require(r == "POINT (3 4)", r)
    }
    // resample at SQL surface
    p("sql rf_resample upsample") {
      val r = spark.sql("""SELECT rf_dimensions(rf_resample(rf_make_constant_tile(1.0, 4, 4, 'float64'), 2.0, 'bilinear')).cols""").collect()(0).getInt(0)
      require(r == 8, s"$r")
    }
    p("bad resample method") {
      spark.sql("""SELECT rf_resample(rf_make_constant_tile(1.0, 4, 4, 'float64'), 2.0, 'cubicspline')""").collect()
    }
    spark.stop()
  }
}
