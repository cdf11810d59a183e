package graft.tools
import org.apache.spark.sql.SparkSession
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    val dir = "/root/testdata/sf0.001"
    def show(name: String): Unit = {
      println(s"===== $name")
      graft.SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    show("q_tile_sum")
    show("q_raster_join")
    show("q_knn_brute")
    show("q_knn_lsh")
    show("q_dedup_pipeline")
    show("q_knn_pq")
    show("q_lm_score")
    show("q_pack")
    show("q_asof")
    show("q_interval_join")
    show("q_bloom_dedup")
    show("q_chunk")
    show("q_quantile_filter")
    show("q_normalize")
    show("q_winnow_pairs")
    show("q_tfidf")
    spark.stop()
  }
}
