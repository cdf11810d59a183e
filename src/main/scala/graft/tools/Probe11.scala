package graft.tools
import org.apache.spark.sql.SparkSession
object Probe11 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    val dir = java.nio.file.Files.createTempDirectory("stacp").toString
    // circular: catalog links to itself and to a dangling item
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/catalog.json"),
      """{"type":"Catalog","id":"c","links":[
        |{"rel":"child","href":"catalog.json"},
        |{"rel":"item","href":"missing.json"},
        |{"rel":"item","href":"ok.json"}]}""".stripMargin.getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/ok.json"),
      """{"type":"Feature","id":"ok","assets":{"a":{"href":"x.tif"}},"properties":{}}""".getBytes)
    try {
      val n = spark.read.format("stac").option("path", s"$dir/catalog.json").load().count()
      println(s"[circular+dangling] OK rows=$n")
    } catch { case e: Throwable => println(s"[circular+dangling] ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    spark.stop()
  }
}
