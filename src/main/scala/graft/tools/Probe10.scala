package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
import graft.extensions._
object Probe10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate().withGraft  // implicit session method
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((0.0, 0.0, 1.0, 1.0), (10.0, 45.0, 11.0, 46.0)).toDF("xmin","ymin","xmax","ymax")
      .select(struct($"xmin",$"ymin",$"xmax",$"ymax").as("extent"), lit("epsg:4326").as("crs"))
    val r = df.agg(rf_agg_reprojected_extent($"extent", $"crs", "epsg:3857").as("u")).select("u.*").collect()(0)
    println(f"[reproj extent union] xmin=${r.getDouble(0)}%.1f ymin=${r.getDouble(1)}%.1f xmax=${r.getDouble(2)}%.1f ymax=${r.getDouble(3)}%.1f")
    // withGraft registered SQL: quick check
    println("[sql via withGraft] " + spark.sql("SELECT rf_tile_sum(rf_make_constant_tile(2.0, 3, 3, 'float64'))").collect()(0).getDouble(0))
    spark.stop()
  }
}
