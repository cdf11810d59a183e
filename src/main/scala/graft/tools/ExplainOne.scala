package graft.tools
import org.apache.spark.sql.SparkSession

/** Ad-hoc: print the executed plan of one SparkEntry query. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    graft.SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
