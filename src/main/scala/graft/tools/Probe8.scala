package graft.tools
import org.apache.spark.sql.SparkSession
object Probe8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    val r = spark.sql("""
      WITH t AS (SELECT rf_make_constant_tile(CAST(id AS DOUBLE), 4, 4, 'float64') AS tile FROM range(100))
      SELECT rf_agg_approx_quantiles(tile, array(0.5, 0.9)) FROM t""").collect()(0).getSeq[Double](0)
    println(s"[sql quantiles] ${r.mkString(",")}")
    spark.stop()
  }
}
