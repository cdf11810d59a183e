package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
object Probe9 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p9layer").toString
    val df = (0 until 40).toDF("id").select($"id",
      rf_synthetic_tile($"id", 16, 16, "uint16").as("tile"),
      struct(($"id" % 10 * 2).cast("double").as("xmin"), lit(0.0).as("ymin"),
        ($"id" % 10 * 2 + 1).cast("double").as("xmax"), lit(1.0).as("ymax")).as("extent"),
      lit("epsg:4326").as("crs"))
    graft.Layer.write(df, dir, partitions = 4)
    println("[layer files] " + new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")))
    val sub = graft.Layer.read(spark, dir, Some(graft.core.Extent(0,0,1,1)))
    println("[spatial query rows] " + sub.count())
    println("[pruned read plan]")
    sub.select($"spatial_index").explain("simple")
    // probe: read a layer dir that isn't a layer
    try { graft.Layer.read(spark, "/tmp/definitely-not-a-layer").count() }
    catch { case e: Throwable => println(s"[bad layer path] ${e.getClass.getSimpleName}") }
    spark.stop()
  }
}
