package graft.tools
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Raster.init(spark)
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(50).createOrReplaceTempView("li")
    def probe(name: String, sql: String): Unit =
      try { spark.sql(sql).collect(); println(s"[$name] OK") }
      catch { case e: Throwable => println(s"[$name] ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
    probe("non-tile arg to rf_tile_sum", "SELECT rf_tile_sum(l_quantity) FROM li")
    probe("bad cell type name", "SELECT rf_convert_cell_type(rf_make_constant_tile(1.0, 2, 2, 'float64'), 'nosuch') FROM li LIMIT 1")
    probe("mismatched dims", "SELECT rf_local_add(rf_make_constant_tile(1.0,2,2,'float64'), rf_make_constant_tile(1.0,3,3,'float64')) FROM li LIMIT 1")
    probe("null tile passthrough", "SELECT rf_tile_sum(CAST(NULL AS BINARY)) FROM li")
    probe("two tiles both null-free", "SELECT rf_tile_mean(rf_local_divide(rf_make_constant_tile(4.0,2,2,'float64'), rf_make_constant_tile(0.0,2,2,'float64'))) FROM li LIMIT 1")
    spark.stop()
  }
}
