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
 * with first()/collect_list → merge expression. `method` is the
 * reference's resampleMethod parameter (RasterJoin.scala:68): the
 * point-interpolation kernel the merge samples RHS tiles with
 * (nearest [default], bilinear, cubic_convolution, cubic_spline,
 * lanczos).
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
      mergedName: String = "right_tile",
      method: String = "nearest"): DataFrame = {
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
      asExpr(dims.getField("cols")), asExpr(dims.getField("rows")),
      asExpr(lit(method)))))

    grouped
      .withColumn(mergedName, merged)
      .drop(id, "__rj_tiles", "__rj_extents", "__rj_crss")
  }

  /**
   * Scale-out variant: instead of a BroadcastNestedLoopJoin over
   * ST_Intersects, both sides are exploded onto a shared extent grid of
   * `cellSize` (in LHS CRS units) and equi-joined on the grid cell — a
   * plain shuffle hash join, bounded by bucket occupancy, no broadcast
   * of either side. A candidate pair can share several cells; it is
   * emitted exactly once, from the cell containing the intersection's
   * min corner. Results are identical to [[apply]].
   */
  def bucketed(left: DataFrame, right: DataFrame,
      leftExtent: Column, leftCrs: Column, leftTile: Column,
      rightExtent: Column, rightCrs: Column, rightTile: Column,
      cellSize: Double, mergedName: String = "right_tile",
      leftId: Option[Column] = None,
      method: String = "nearest"): DataFrame = {
    val id = "__rj_id"
    // The LHS plan is evaluated twice (candidates + final left-outer), so
    // the row id must be STABLE across evaluations. A caller-supplied
    // unique key costs nothing and is the 100 TB path; the fallback pins
    // the monotonically_increasing_id assignment with an EAGER
    // localCheckpoint: unlike persist(), evicted blocks can never be
    // silently recomputed with different ids (loss fails the job), and
    // the blocks are reclaimed by the ContextCleaner once the result
    // plan is dropped.
    val l = leftId match {
      case Some(k) => left.withColumn(id, k)
      case None => left.withColumn(id, monotonically_increasing_id())
        .localCheckpoint(true)
    }

    def cellsOf(extent: Column): Column = {
      val c0 = floor(extent.getField("xmin") / cellSize).cast("long")
      val c1 = floor(extent.getField("xmax") / cellSize).cast("long")
      val r0 = floor(extent.getField("ymin") / cellSize).cast("long")
      val r1 = floor(extent.getField("ymax") / cellSize).cast("long")
      flatten(transform(sequence(c0, c1), cc =>
        transform(sequence(r0, r1), rr => struct(cc.as("cx"), rr.as("cy")))))
    }

    // Bucketing assumes both sides' extents are expressed in the LHS CRS
    // (pre-reproject RHS extents when CRSs differ; merge still honors the
    // per-row RHS CRS when resampling cells).
    val lb = l.withColumn("__cell", explode(cellsOf(leftExtent)))
    val rb = right.withColumn("__cell", explode(cellsOf(rightExtent)))

    val joined = lb.join(rb, Seq("__cell"))
      .where(asColumn(SpatialRelation(
        asExpr(asColumn(ExtentToGeometry(asExpr(leftExtent)))),
        asExpr(asColumn(ExtentToGeometry(asExpr(rightExtent)))), "Intersects")))
      // single emission: only the cell holding the intersection's min corner
      .where(col("__cell.cx") ===
        floor(greatest(leftExtent.getField("xmin"), rightExtent.getField("xmin")) / cellSize).cast("long") &&
        col("__cell.cy") ===
        floor(greatest(leftExtent.getField("ymin"), rightExtent.getField("ymin")) / cellSize).cast("long"))

    val leftCols = left.columns.toSeq
    val aggs =
      leftCols.map(c => first(col(c), ignoreNulls = false).as(c)) ++ Seq(
        collect_list(rightTile).as("__rj_tiles"),
        collect_list(rightExtent).as("__rj_extents"),
        collect_list(rightCrs).as("__rj_crss"))
    val grouped = joined.groupBy(col(id)).agg(aggs.head, aggs.tail: _*)

    val dims = asColumn(GetDimensions(asExpr(col(leftTile.toString()))))
    val merged = asColumn(ReprojectAndMerge(Seq(
      asExpr(col("__rj_tiles")), asExpr(col("__rj_extents")), asExpr(col("__rj_crss")),
      asExpr(asColumn(GetExtent(asExpr(col(leftExtent.toString()))))),
      asExpr(col(leftCrs.toString())),
      asExpr(dims.getField("cols")), asExpr(dims.getField("rows")),
      asExpr(lit(method)))))
    val matched = grouped.withColumn(mergedName, merged)
      .drop("__rj_tiles", "__rj_extents", "__rj_crss")
      .drop(leftCols: _*)

    // left-outer semantics: LHS rows with no candidates keep a null merge
    l.join(matched, Seq(id), "left_outer").drop(id)
  }
}
