package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
object Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p4").toString
    // write 4 georeferenced tiles
    Seq(0,1,2,3).toDF("id").select($"id",
      rf_synthetic_tile($"id", 64, 64, "uint16").as("tile"),
      struct(($"id" % 2).cast("double").as("xmin"), lit(0.0).as("ymin"),
        ($"id" % 2 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
      lit("epsg:32618").as("crs"))
      .write.format("tiles").option("path", dir).save()
    println("[write tiles] " + new java.io.File(dir).list().sorted.mkString(", "))
    val back = spark.read.format("raster").option("path", dir).load()
    println("[read raster] rows=" + back.count())
    back.select($"path", $"spatial_key", $"crs", rf_tile_sum($"tile").as("s")).show(4, 60)
    println("[pruned plan]")
    back.select($"crs").distinct().explain("simple")
    // probes
    def p(name: String)(body: => Unit): Unit =
      try { body; println(s"[$name] OK") } catch { case e: Throwable =>
        var c: Throwable = e; while (c.getCause != null) c = c.getCause
        println(s"[$name] ${c.getClass.getSimpleName}: ${Option(c.getMessage).map(_.linesIterator.next()).getOrElse("")}") }
    p("missing path") { spark.read.format("geotiff").load().collect() }
    p("nonexistent file") { spark.read.format("geotiff").option("path", "/tmp/nope.tif").load().collect() }
    p("garbage tiff") {
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/bad.tif"), "not a tiff".getBytes)
      spark.read.format("geotiff").option("path", s"$dir/bad.tif").load().collect()
    }
    spark.stop()
  }
}
