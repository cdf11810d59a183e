package graft.core

/**
 * Raster resampling kernels (reference ops: rf_resample /
 * rf_resample_nearest, /root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/localops/Resample.scala).
 * Center-aligned sampling: destination cell (c,r) samples the source at
 * ((c+0.5)·sx, (r+0.5)·sy).
 */
object Resample {

  def nearest(t: Tile, dstCols: Int, dstRows: Int): Tile = {
    val out = Tile.empty(t.cellType, dstCols, dstRows)
    val sx = t.cols.toDouble / dstCols
    val sy = t.rows.toDouble / dstRows
    var r = 0
    while (r < dstRows) {
      val sr = math.min(t.rows - 1, ((r + 0.5) * sy).toInt)
      var c = 0
      while (c < dstCols) {
        val sc = math.min(t.cols - 1, ((c + 0.5) * sx).toInt)
        out.setDouble(r * dstCols + c, t.getDouble(sr * t.cols + sc))
        c += 1
      }
      r += 1
    }
    out
  }

  def bilinear(t: Tile, dstCols: Int, dstRows: Int): Tile = {
    val out = Tile.empty(CellType.float64, dstCols, dstRows)
    val sx = t.cols.toDouble / dstCols
    val sy = t.rows.toDouble / dstRows
    var r = 0
    while (r < dstRows) {
      val y = (r + 0.5) * sy - 0.5
      val r0 = math.max(0, math.min(t.rows - 1, math.floor(y).toInt))
      val r1 = math.min(t.rows - 1, r0 + 1)
      val fy = y - r0
      var c = 0
      while (c < dstCols) {
        val x = (c + 0.5) * sx - 0.5
        val c0 = math.max(0, math.min(t.cols - 1, math.floor(x).toInt))
        val c1 = math.min(t.cols - 1, c0 + 1)
        val fx = x - c0
        val v00 = t.getDouble(r0 * t.cols + c0)
        val v01 = t.getDouble(r0 * t.cols + c1)
        val v10 = t.getDouble(r1 * t.cols + c0)
        val v11 = t.getDouble(r1 * t.cols + c1)
        // weighted mean over data neighbors (weights renormalized when some are NoData)
        var wsum = 0.0; var vsum = 0.0
        def acc(v: Double, w: Double): Unit =
          if (NoData.isData(v) && w > 0) { wsum += w; vsum += v * w }
        acc(v00, (1 - fx) * (1 - fy)); acc(v01, fx * (1 - fy))
        acc(v10, (1 - fx) * fy); acc(v11, fx * fy)
        out.setDouble(r * dstCols + c, if (wsum == 0) Double.NaN else vsum / wsum)
        c += 1
      }
      r += 1
    }
    out
  }

  def apply(t: Tile, dstCols: Int, dstRows: Int, method: String): Tile =
    method.toLowerCase match {
      case "nearest" | "nearest_neighbor" => nearest(t, dstCols, dstRows)
      case "bilinear" => bilinear(t, dstCols, dstRows)
      case m => throw new IllegalArgumentException(
        s"Unsupported resample method: $m (nearest, bilinear)")
    }
}
