package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
object Probe7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p7").toString
    Seq(0).toDF("id").select(
      rf_synthetic_tile($"id", 32, 32, "uint8").as("tile"),
      struct(lit(0.0).as("xmin"), lit(0.0).as("ymin"), lit(1.0).as("xmax"), lit(1.0).as("ymax")).as("extent"),
      lit("epsg:4326").as("crs"))
      .write.format("tiles").option("path", dir).save()
    val lzy = spark.read.format("raster").option("path", dir).option("lazy_tiles","true").load()
    val metadataOnly = lzy.select($"crs").collect() // plans and reads metadata only
    println(s"[metadata-before-delete] OK ${metadataOnly.length} rows")
    // now delete the backing file and try to realize cells
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".tif")).foreach(_.delete())
    try { lzy.select(rf_tile_sum($"tile")).collect(); println("[realize-after-delete] OK (unexpected)") }
    catch { case e: Throwable =>
      var c: Throwable = e; while (c.getCause != null) c = c.getCause
      println(s"[realize-after-delete] ${c.getClass.getSimpleName}: ${Option(c.getMessage).map(_.linesIterator.next()).getOrElse("")}") }
    spark.stop()
  }
}
