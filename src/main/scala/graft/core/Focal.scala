package graft.core

/**
 * Focal (neighborhood) kernels over a single tile. NoData neighbors are
 * skipped; windows are clipped at tile edges. Cross-tile halos
 * (BufferTile) arrive with the raster-source reader; within one tile
 * these match the reference's focal semantics
 * (/root/reference/core/src/main/scala/org/locationtech/rasterframes/expressions/focalops/).
 */
object Focal {

  sealed trait Neighborhood { def radius: Int; def inside(dc: Int, dr: Int): Boolean }
  final case class Square(radius: Int) extends Neighborhood {
    def inside(dc: Int, dr: Int): Boolean = true
  }
  final case class Circle(radius: Int) extends Neighborhood {
    def inside(dc: Int, dr: Int): Boolean = dc * dc + dr * dr <= radius * radius
  }
  object Neighborhood {
    /** Parse "square-1", "circle-2", or a bare integer radius (square). */
    def parse(s: String): Neighborhood = {
      val t = s.trim.toLowerCase
      t.toIntOption match {
        case Some(r) => Square(r)
        case None =>
          val parts = t.split("[-x]")
          val r = parts.last.toIntOption.getOrElse(1)
          if (t.startsWith("circle")) Circle(r) else Square(r)
      }
    }
  }

  /** Generic focal transform: `finish(values, count)` over the window's
    * data cells. Allocates one scratch buffer across all cells. */
  def focal(t: Tile, n: Neighborhood)(finish: (Array[Double], Int) => Double): Tile = {
    val out = Tile.empty(CellType.float64, t.cols, t.rows)
    val r = n.radius
    val buf = new Array[Double]((2 * r + 1) * (2 * r + 1))
    var row = 0
    while (row < t.rows) {
      var colI = 0
      while (colI < t.cols) {
        var k = 0
        var dr = -r
        while (dr <= r) {
          val rr = row + dr
          if (rr >= 0 && rr < t.rows) {
            var dc = -r
            while (dc <= r) {
              val cc = colI + dc
              if (cc >= 0 && cc < t.cols && n.inside(dc, dr)) {
                val v = t.getDouble(rr * t.cols + cc)
                if (NoData.isData(v)) { buf(k) = v; k += 1 }
              }
              dc += 1
            }
          }
          dr += 1
        }
        out.setDouble(row * t.cols + colI,
          if (k == 0) Double.NaN else finish(buf, k))
        colI += 1
      }
      row += 1
    }
    out
  }

  def mean(t: Tile, n: Neighborhood): Tile = focal(t, n) { (b, k) =>
    var s = 0.0; var i = 0
    while (i < k) { s += b(i); i += 1 }
    s / k
  }
  def sum(t: Tile, n: Neighborhood): Tile = focal(t, n) { (b, k) =>
    var s = 0.0; var i = 0
    while (i < k) { s += b(i); i += 1 }
    s
  }
  def min(t: Tile, n: Neighborhood): Tile = focal(t, n) { (b, k) =>
    var m = b(0); var i = 1
    while (i < k) { if (b(i) < m) m = b(i); i += 1 }
    m
  }
  def max(t: Tile, n: Neighborhood): Tile = focal(t, n) { (b, k) =>
    var m = b(0); var i = 1
    while (i < k) { if (b(i) > m) m = b(i); i += 1 }
    m
  }
  def median(t: Tile, n: Neighborhood): Tile = focal(t, n) { (b, k) =>
    val a = java.util.Arrays.copyOf(b, k)
    java.util.Arrays.sort(a)
    if (k % 2 == 1) a(k / 2) else (a(k / 2 - 1) + a(k / 2)) / 2.0
  }
  def mode(t: Tile, n: Neighborhood): Tile = focal(t, n) { (b, k) =>
    val a = java.util.Arrays.copyOf(b, k)
    java.util.Arrays.sort(a)
    var best = a(0); var bestCount = 1
    var cur = a(0); var count = 1
    var i = 1
    while (i < k) {
      if (a(i) == cur) count += 1
      else { cur = a(i); count = 1 }
      if (count > bestCount) { best = cur; bestCount = count }
      i += 1
    }
    best
  }
  def stddev(t: Tile, n: Neighborhood): Tile = focal(t, n) { (b, k) =>
    if (k < 2) 0.0
    else {
      var s = 0.0; var i = 0
      while (i < k) { s += b(i); i += 1 }
      val m = s / k
      var s2 = 0.0; i = 0
      while (i < k) { val d = b(i) - m; s2 += d * d; i += 1 }
      math.sqrt(s2 / (k - 1))
    }
  }

  /** Focal Moran's I: z_i · mean(z_neighbors) with z standardized by the
    * tile's global mean/stddev (neighbors exclude the center). */
  def moransI(t: Tile, n: Neighborhood): Tile = {
    val (c, _, _, _, s, s2) = t.statsAccum
    if (c < 2) return Tile.empty(CellType.float64, t.cols, t.rows)
    val mu = s / c
    val sd = math.sqrt((s2 - s * mu) / (c - 1))
    val z = t.mapDouble(v => (v - mu) / sd)
    val out = Tile.empty(CellType.float64, t.cols, t.rows)
    val r = n.radius
    var row = 0
    while (row < t.rows) {
      var colI = 0
      while (colI < t.cols) {
        val zi = z.getDouble(row * t.cols + colI)
        if (NoData.isData(zi)) {
          var sN = 0.0; var k = 0
          var dr = -r
          while (dr <= r) {
            var dc = -r
            while (dc <= r) {
              if ((dc != 0 || dr != 0) && n.inside(dc, dr)) {
                val rr = row + dr; val cc = colI + dc
                if (rr >= 0 && rr < t.rows && cc >= 0 && cc < t.cols) {
                  val v = z.getDouble(rr * t.cols + cc)
                  if (NoData.isData(v)) { sN += v; k += 1 }
                }
              }
              dc += 1
            }
            dr += 1
          }
          out.setDouble(row * t.cols + colI, if (k == 0) Double.NaN else zi * (sN / k))
        }
        colI += 1
      }
      row += 1
    }
    out
  }

  /** Convolution with a (2r+1)² kernel; NoData cells contribute 0. */
  def convolve(t: Tile, kernel: Array[Double], kDim: Int): Tile = {
    val r = kDim / 2
    val out = Tile.empty(CellType.float64, t.cols, t.rows)
    var row = 0
    while (row < t.rows) {
      var colI = 0
      while (colI < t.cols) {
        var s = 0.0; var any = false
        var dr = -r
        while (dr <= r) {
          var dc = -r
          while (dc <= r) {
            val rr = row + dr; val cc = colI + dc
            if (rr >= 0 && rr < t.rows && cc >= 0 && cc < t.cols) {
              val v = t.getDouble(rr * t.cols + cc)
              if (NoData.isData(v)) {
                s += v * kernel((dr + r) * kDim + (dc + r)); any = true
              }
            }
            dc += 1
          }
          dr += 1
        }
        out.setDouble(row * t.cols + colI, if (any) s else Double.NaN)
        colI += 1
      }
      row += 1
    }
    out
  }

  // ---- terrain (Horn's method, as in standard DEM literature) ----
  private def horn(t: Tile, cw: Double, ch: Double)(f: (Double, Double) => Double): Tile = {
    val out = Tile.empty(CellType.float64, t.cols, t.rows)
    val cols = t.cols; val rows = t.rows
    @inline def v(c: Int, r: Int, fallback: Double): Double = {
      if (c < 0 || c >= cols || r < 0 || r >= rows) fallback
      else {
        val x = t.getDouble(r * cols + c)
        if (NoData.isData(x)) x else fallback
      }
    }
    var r = 0
    while (r < rows) {
      var c = 0
      while (c < cols) {
        val center = t.getDouble(r * cols + c)
        if (NoData.isData(center)) {
          val a = v(c - 1, r - 1, center); val b = v(c, r - 1, center); val cc2 = v(c + 1, r - 1, center)
          val d = v(c - 1, r, center); val f2 = v(c + 1, r, center)
          val g = v(c - 1, r + 1, center); val h = v(c, r + 1, center); val i = v(c + 1, r + 1, center)
          val dzdx = ((cc2 + 2 * f2 + i) - (a + 2 * d + g)) / (8 * cw)
          val dzdy = ((g + 2 * h + i) - (a + 2 * b + cc2)) / (8 * ch)
          out.setDouble(r * cols + c, f(dzdx, dzdy))
        }
        c += 1
      }
      r += 1
    }
    out
  }

  /** Slope in degrees. */
  def slope(t: Tile, cw: Double, ch: Double, zFactor: Double): Tile =
    horn(t, cw, ch) { (dx, dy) =>
      math.toDegrees(math.atan(zFactor * math.sqrt(dx * dx + dy * dy)))
    }

  /** Aspect in degrees clockwise from north; flat → 0. */
  def aspect(t: Tile, cw: Double, ch: Double): Tile =
    horn(t, cw, ch) { (dx, dy) =>
      if (dx == 0 && dy == 0) 0.0
      else {
        val a = math.toDegrees(math.atan2(dy, -dx))
        val az = 90.0 - a
        if (az < 0) az + 360.0 else if (az >= 360.0) az - 360.0 else az
      }
    }

  /** Hillshade 0-255 (standard azimuth/altitude illumination model). */
  def hillshade(t: Tile, cw: Double, ch: Double,
      azimuthDeg: Double, altitudeDeg: Double, zFactor: Double): Tile = {
    val az = math.toRadians(360.0 - azimuthDeg + 90.0)
    val alt = math.toRadians(altitudeDeg)
    horn(t, cw, ch) { (dx0, dy0) =>
      val dx = dx0 * zFactor; val dy = dy0 * zFactor
      val slopeR = math.atan(math.sqrt(dx * dx + dy * dy))
      val aspectR = math.atan2(-dy, dx)
      val v = math.sin(alt) * math.cos(slopeR) +
        math.cos(alt) * math.sin(slopeR) * math.cos(az - aspectR)
      math.max(0.0, math.rint(255.0 * v))
    }
  }
}
