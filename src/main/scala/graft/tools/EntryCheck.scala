package graft.tools
import org.apache.spark.sql.SparkSession
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println(s"[entry rows] ${df.count()}")
    df.show(3, 80)
    spark.stop()
  }
}
