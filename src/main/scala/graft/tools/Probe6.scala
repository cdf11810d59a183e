package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
object Probe6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("p6").toString
    val grid = Seq(0,1,2,3).toDF("id").select($"id",
      rf_synthetic_tile($"id", 32, 32, "float64").as("tile"),
      struct(($"id" % 2 * 10).cast("double").as("xmin"),
        expr("(id div 2) * 10").cast("double").as("ymin"),
        ($"id" % 2 * 10 + 10).cast("double").as("xmax"),
        expr("(id div 2) * 10 + 10").cast("double").as("ymax")).as("extent"),
      lit("epsg:4326").as("crs"))
    grid.select($"tile",$"extent",$"crs").write.format("slippy")
      .option("path", dir).option("zoom", "6").save()
    println("[tree] " + new java.io.File(dir).listFiles().map(_.getName).sorted.mkString(","))
    val pngs = new java.io.File(s"$dir/6").listFiles().flatMap(_.listFiles())
    println(s"[pngs] n=${pngs.length} first=${pngs.head}")
    val hdr = java.nio.file.Files.readAllBytes(pngs.head.toPath).take(8).map(b => b & 0xff).mkString(",")
    println(s"[png header] $hdr")
    def p(name: String)(body: => Unit): Unit =
      try { body; println(s"[$name] OK") } catch { case e: Throwable =>
        var c: Throwable = e; while (c.getCause != null) c = c.getCause
        println(s"[$name] ${c.getClass.getSimpleName}: ${Option(c.getMessage).map(_.linesIterator.next()).getOrElse("")}") }
    p("missing tile col") {
      Seq(1).toDF("x").write.format("slippy").option("path", dir + "2").save()
    }
    spark.stop()
  }
}
