package graft

import graft.expressions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Spatial raster join: left-outer theta-join on footprint intersection,
 * regroup to one row per LHS row, then reproject+merge the RHS tiles
 * onto the LHS grid. Same recipe as the reference
 * (/root/reference/core/src/main/scala/org/locationtech/rasterframes/extensions/RasterJoin.scala:68-133):
 * monotonically_increasing_id → BNLJ on ST_Intersects → groupBy(id)
 * with first()/collect_list → merge expression.
 *
 * Scale note: Spark plans the theta join as BroadcastNestedLoopJoin
 * (right side broadcast). For catalogs too large to broadcast, pre-bucket
 * both sides by a shared extent grid (e.g. rf_xz2_index at a coarse
 * resolution) and add the bucket to the join key, turning it into an
 * equi-join + local intersection test — same results, shuffle-bounded.
 */
object RasterJoin {

  /**
   * @param left      LHS frame; one output row per input row
   * @param right     RHS frame with georeferenced tiles
   * @param leftExtent / leftCrs / leftTile  LHS grid columns
   * @param rightExtent / rightCrs / rightTile RHS tile columns
   */
  def apply(left: DataFrame, right: DataFrame,
      leftExtent: Column, leftCrs: Column, leftTile: Column,
      rightExtent: Column, rightCrs: Column, rightTile: Column,
      mergedName: String = "right_tile"): DataFrame = {
    val id = "__rj_id"
    val l = left.withColumn(id, monotonically_increasing_id())
    val lGeom = asColumn(ExtentToGeometry(asExpr(leftExtent)))
    val rGeomReproj = asColumn(ReprojectGeometry(
      asExpr(asColumn(ExtentToGeometry(asExpr(rightExtent)))),
      asExpr(rightCrs), asExpr(leftCrs)))
    val predicate = asColumn(SpatialRelation(asExpr(lGeom), asExpr(rGeomReproj), "Intersects"))

    val joined = l.join(right, predicate, "left_outer")

    val leftCols = left.columns.toSeq
    val aggs =
      leftCols.map(c => first(col(c), ignoreNulls = false).as(c)) ++ Seq(
        collect_list(rightTile).as("__rj_tiles"),
        collect_list(rightExtent).as("__rj_extents"),
        collect_list(rightCrs).as("__rj_crss"))
    val grouped = joined.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)

    val dims = asColumn(GetDimensions(asExpr(col(leftTile.toString())))) // dims of LHS tile
    val merged = asColumn(ReprojectAndMerge(Seq(
      asExpr(col("__rj_tiles")), asExpr(col("__rj_extents")), asExpr(col("__rj_crss")),
      asExpr(asColumn(GetExtent(asExpr(col(leftExtent.toString()))))),
      asExpr(col(leftCrs.toString())),
      asExpr(dims.getField("cols")), asExpr(dims.getField("rows")))))

    grouped
      .withColumn(mergedName, merged)
      .drop(id, "__rj_tiles", "__rj_extents", "__rj_crss")
  }
}
