package graft

import graft.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Parquet-native tile layers — graft's replacement for the reference's
 * GeoTrellis Avro layer catalogs (SURVEY.md §2.1 "geotrellis write →
 * Parquet write of tile DataFrame (our native layer format)").
 *
 * A layer is a plain Parquet dataset of
 * `{spatial_key, extent, crs, spatial_index, tile…}` rows,
 * range-partitioned by XZ2 index so Parquet min/max statistics give
 * file skipping for spatial range queries (the role of the reference's
 * Z-curve indexed layer writer, GeoTrellisLayerDataSource.scala:74-110).
 * Tiles round-trip as the TileUDT's underlying struct — every graft
 * expression accepts the bare struct after read-back.
 */
object Layer {

  /** Write a georeferenced tile frame as a spatially-sorted Parquet layer.
    * Expects `extent` and `crs` columns; all other columns pass through. */
  def write(df: DataFrame, path: String, partitions: Int = 0): DataFrame = {
    val indexed = df.withColumn("spatial_index",
      rf_xz2_index(st_geometry(col("extent")), col("crs")))
    val parts = if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    indexed
      .repartitionByRange(parts, col("spatial_index"))
      .sortWithinPartitions("spatial_index")
      .write.mode("overwrite").parquet(path)
    indexed
  }

  /** Read a layer back; `query` extent prunes via the spatial index
    * (Parquet min/max on spatial_index + the exact extent predicate). */
  def read(spark: SparkSession, path: String,
      query: Option[graft.core.Extent] = None): DataFrame = {
    val df = spark.read.parquet(path)
    query match {
      case None => df
      case Some(e) =>
        // interval predicates on the extent fields are Parquet-pushable
        // (row-group min/max skipping); st_intersects alone is not
        df.where(col("extent.xmin") <= e.xmax && col("extent.xmax") >= e.xmin &&
          col("extent.ymin") <= e.ymax && col("extent.ymax") >= e.ymin)
    }
  }
}
