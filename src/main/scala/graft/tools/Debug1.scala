package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions._
object Debug1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    import spark.implicits._
    val df = Seq((1, Seq(1.0,2.0)), (2, Seq(3.0,4.0)), (1, Seq(5.0,6.0))).toDF("k","a")
      .select($"k", rf_array_to_tile($"a", 2, 1).as("t"))
    try {
      df.groupBy($"k").agg(rf_agg_mean($"t").as("m")).orderBy("k").show()
    } catch { case e: Throwable =>
      var c: Throwable = e
      while (c.getCause != null) c = c.getCause
      c.printStackTrace()
    }
    spark.stop()
  }
}
