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
    * Expects `extent` and `crs` columns; all other columns pass through.
    *
    * `index` picks the space-filling curve that orders the files — the
    * reference's `withSpatialIndex(applyOrdering=true)` role
    * (ref extensions/LayerSpatialColumnMethods.scala:122-133, which is
    * Z2-only): "xz2" (default; extent-native, never splits a footprint
    * across curve cells) or "hilbert" (centroid-keyed, locality-first —
    * consecutive index values are always grid-adjacent, so
    * range-partitioned files cover tighter spatial rectangles; see
    * LayoutSpec's measured pruning panel). Reads and spatial queries are
    * index-agnostic: pruning predicates hit the extent fields' min-max
    * stats, which both orderings make selective. */
  def write(df: DataFrame, path: String, partitions: Int = 0,
      index: String = "xz2"): DataFrame = {
    val indexExpr = index match {
      case "xz2" => rf_xz2_index(st_geometry(col("extent")), col("crs"))
      case "hilbert" => rf_hilbert_index(st_geometry(col("extent")), col("crs"))
      case other => throw new IllegalArgumentException(
        s"Layer.write index must be 'xz2' or 'hilbert', got '$other'")
    }
    val indexed = df.withColumn("spatial_index", indexExpr)
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

  /** First tile column name, crs and tile dimensions of a layer — cheap
    * single-row probe used for layout compatibility checks. Memoized per
    * analyzed plan (weak keys) so repeated joins over the same layer
    * don't re-run the probe job. */
  private val layoutCache =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        Option[(String, Int, Int)]]())
  private def layout(df: DataFrame): Option[(String, Int, Int)] =
    layoutCache.computeIfAbsent(df.queryExecution.analyzed, _ => {
      val tileCol = df.schema.fields
        .find(f => graft.udt.TileUDT.isTileType(f.dataType)).map(_.name)
      tileCol.flatMap { tc =>
        val crsCol = if (df.columns.contains("crs")) col("crs") else lit("?")
        df.select(crsCol.cast("string").as("crs"), rf_dimensions(col(tc)).as("d"))
          .limit(1).collect().headOption
          .map(r => (r.getString(0), r.getStruct(1).getInt(0), r.getStruct(1).getInt(1)))
      }
    })

  /**
   * Key-aligned join of two layers: equi-join on `spatial_key` (and
   * `temporal_key` when both sides carry one) — a plain shuffle hash
   * join on the key, never a spatial theta join. Logs a warning when
   * the two layers' CRS or tile layout differ, like the reference
   * (/root/reference/core/src/main/scala/org/locationtech/rasterframes/extensions/RasterFrameLayerMethods.scala:137-192);
   * join results are only meaningful for co-gridded layers.
   * Right-side column names colliding with the left are prefixed
   * `right_` (keys excepted).
   */
  def spatialJoin(left: DataFrame, right: DataFrame,
      joinType: String = "inner"): DataFrame = {
    require(left.columns.contains("spatial_key") && right.columns.contains("spatial_key"),
      "spatialJoin requires a spatial_key column on both layers")
    (layout(left), layout(right)) match {
      case (Some(l), Some(r)) if l != r =>
        Console.err.println(
          s"WARN graft.Layer.spatialJoin: layers have different CRS/layout: $l vs $r — " +
            "key-aligned join assumes a shared tiling grid")
      case _ => ()
    }
    val keys = Seq("spatial_key") ++
      (if (left.columns.contains("temporal_key") && right.columns.contains("temporal_key"))
        Seq("temporal_key") else Seq.empty)
    val collisions = right.columns.toSet.intersect(left.columns.toSet) -- keys
    val renamed = collisions.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"right_$c"))
    left.join(renamed, keys, joinType)
  }

  /**
   * Layer-level metadata in one pass: union extent, key bounds, cell
   * type, tile dimensions and CRS — the role of the reference's
   * ProjectedLayerMetadataAggregate
   * (/root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/aggregates/ProjectedLayerMetadataAggregate.scala:36-143),
   * expressed as a composition of built-in (partial-aggregated)
   * min/max/first instead of a custom buffer.
   */
  def metadata(df: DataFrame): DataFrame = {
    val tileCol = df.schema.fields
      .find(f => graft.udt.TileUDT.isTileType(f.dataType)).map(_.name)
      .getOrElse(throw new IllegalArgumentException("layer has no tile column"))
    val hasKey = df.columns.contains("spatial_key")
    val keyAggs =
      if (hasKey) Seq(
        min(col("spatial_key.col")).as("key_col_min"),
        min(col("spatial_key.row")).as("key_row_min"),
        max(col("spatial_key.col")).as("key_col_max"),
        max(col("spatial_key.row")).as("key_row_max"))
      else Seq.empty
    val aggs = Seq(
      struct(
        min(col("extent.xmin")).as("xmin"), min(col("extent.ymin")).as("ymin"),
        max(col("extent.xmax")).as("xmax"), max(col("extent.ymax")).as("ymax")).as("extent"),
      first(col("crs")).as("crs"),
      first(rf_cell_type(col(tileCol))).as("cell_type"),
      first(rf_dimensions(col(tileCol))).as("tile_dimensions"),
      count(lit(1)).as("tile_count")) ++ keyAggs
    df.agg(aggs.head, aggs.tail: _*)
  }
}
