package graft

import java.nio.file.Files

import graft.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingGeoJsonSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("geojson reader infers properties and decodes geometries") {
    val dir = Files.createTempDirectory("geojson").toString
    val json =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","geometry":{"type":"Point","coordinates":[1.5,2.5]},"properties":{"name":"a","value":10}},
        |{"type":"Feature","geometry":{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]},"properties":{"name":"b","value":20}}
        |]}""".stripMargin
    Files.write(java.nio.file.Paths.get(s"$dir/test.geojson"), json.getBytes)
    val df = spark.read.format("geojson").option("path", s"$dir/test.geojson").load()
    assert(df.columns.toSet == Set("geometry", "name", "value"))
    val rows = df.select(st_area($"geometry").as("area"), $"name").orderBy("name").collect()
    assert(rows(0).getDouble(0) == 0.0 && rows(0).getString(1) == "a")
    assert(rows(1).getDouble(0) == 16.0 && rows(1).getString(1) == "b")
  }

  test("stateless rf_* expressions run under structured streaming") {
    // All graft scalar expressions are stateless → usable in readStream
    // pipelines unchanged (SURVEY.md §1.1: streaming "for free").
    val dir = Files.createTempDirectory("stream-in").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(200)
    li.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(li.schema).parquet(dir)
      .withColumn("t", rf_make_constant_tile(col("l_quantity"), 4, 4, "float64"))
      .select(col("l_orderkey"), rf_tile_sum(rf_local_multiply(col("t"), 2.0)).as("s"))
    val q = stream.writeStream.format("memory").queryName("graft_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT count(*) c, min(s), max(s) FROM graft_stream").collect()(0)
    assert(out.getLong(0) == 200L)
    assert(out.getDouble(1) >= 2.0 * 16) // min qty 1 → 2*16 cells
  }

  test("windowed streaming aggregate over tiles") {
    val dir = Files.createTempDirectory("stream-in2").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").limit(500)
    li.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(li.schema).parquet(dir)
      .withColumn("t", rf_make_constant_tile(col("l_quantity"), 2, 2, "float64"))
      // parquet ms timestamps surface as TIMESTAMP_NTZ; watermarks need TIMESTAMP
      .withColumn("evt", col("l_shipdate").cast("timestamp"))
      .withWatermark("evt", "10 days")
      .groupBy(window(col("evt"), "30 days"))
      .agg(rf_agg_mean(col("t")).as("m"), rf_agg_data_cells(col("t")).as("n"))
    val q = stream.writeStream.format("memory").queryName("graft_stream_win")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val out = spark.sql("SELECT sum(n) FROM graft_stream_win").collect()(0)
    assert(out.getLong(0) == 500L * 4)
  }
}
