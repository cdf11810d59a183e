package graft.core.crs

/**
 * Minimal CRS registry + transforms, replacing the reference's
 * proj4j/GeoTrellis dependency (not on this classpath — SURVEY.md §7.0).
 * Supported: EPSG:4326 (WGS84 lon/lat), EPSG:3857 (web mercator),
 * EPSG:326xx/327xx (WGS84 UTM zones, Transverse Mercator per the
 * standard Karney/Krüger series used by published references).
 * A CRS is identified by its string; equality is string-normalized,
 * mirroring the reference's string-backed CrsUDT
 * (/root/reference/core/src/main/scala/org/apache/spark/sql/rf/CrsUDT.scala:31-45).
 */
final case class CRS(code: String) {
  val normalized: String = code.trim.toLowerCase
  def epsg: Option[Int] =
    if (normalized.startsWith("epsg:")) normalized.drop(5).toIntOption else None
  override def toString: String = normalized
}

object CRS {
  val wgs84: CRS = CRS("epsg:4326")
  val webMercator: CRS = CRS("epsg:3857")

  private val R = 6378137.0 // WGS84 semi-major
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2 - F) // first eccentricity squared

  /** Forward transform point (x, y) from `src` to `dst`. Input/output in
    * the axis order (lon, lat) for 4326 and (x, y) meters otherwise. */
  def transform(x: Double, y: Double, src: CRS, dst: CRS): (Double, Double) = {
    if (src.normalized == dst.normalized) return (x, y)
    val (lon, lat) = toLonLat(x, y, src)
    fromLonLat(lon, lat, dst)
  }

  def toLonLat(x: Double, y: Double, src: CRS): (Double, Double) = src.epsg match {
    case Some(4326) => (x, y)
    case Some(3857) =>
      val lon = math.toDegrees(x / R)
      val lat = math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)
      (lon, lat)
    case Some(e) if isUtm(e) =>
      val (zone, north) = utmZone(e)
      tmInverse(x - 500000.0, if (north) y else y - 10000000.0, utmCentralMeridian(zone))
    case _ => throw new IllegalArgumentException(s"Unsupported CRS: ${src.code}")
  }

  def fromLonLat(lon: Double, lat: Double, dst: CRS): (Double, Double) = dst.epsg match {
    case Some(4326) => (lon, lat)
    case Some(3857) =>
      val x = R * math.toRadians(lon)
      val y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
      (x, y)
    case Some(e) if isUtm(e) =>
      val (zone, north) = utmZone(e)
      val (ex, ny) = tmForward(lon, lat, utmCentralMeridian(zone))
      (ex + 500000.0, if (north) ny else ny + 10000000.0)
    case _ => throw new IllegalArgumentException(s"Unsupported CRS: ${dst.code}")
  }

  private def isUtm(e: Int): Boolean =
    (e >= 32601 && e <= 32660) || (e >= 32701 && e <= 32760)
  /** Whether this CRS is in the supported registry (4326, 3857, UTM
    * zones) — the validation face of rf_mk_crs. */
  def isSupported(crs: CRS): Boolean =
    crs.epsg.exists(e => e == 4326 || e == 3857 || isUtm(e))
  private def utmZone(e: Int): (Int, Boolean) =
    if (e >= 32701) (e - 32700, false) else (e - 32600, true)
  private def utmCentralMeridian(zone: Int): Double = -183.0 + 6.0 * zone

  private val K0 = 0.9996

  /** Transverse Mercator forward (series form, standard published
    * formulas; accurate to ~1mm within a UTM zone). Returns (easting
    * without false easting, northing). */
  private[crs] def tmForward(lonDeg: Double, latDeg: Double, lon0Deg: Double): (Double, Double) = {
    val lat = math.toRadians(latDeg)
    val dLon = math.toRadians(lonDeg - lon0Deg)
    val sinLat = math.sin(lat); val cosLat = math.cos(lat); val tanLat = math.tan(lat)
    val n = R / math.sqrt(1 - E2 * sinLat * sinLat)
    val t = tanLat * tanLat
    val c = E2 / (1 - E2) * cosLat * cosLat
    val a = cosLat * dLon
    val m = meridianArc(lat)
    val x = K0 * n * (a + (1 - t + c) * a * a * a / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * E2 / (1 - E2)) * math.pow(a, 5) / 120)
    val y = K0 * (m + n * tanLat * (a * a / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(a, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * E2 / (1 - E2)) * math.pow(a, 6) / 720))
    (x, y)
  }

  private[crs] def tmInverse(x: Double, y: Double, lon0Deg: Double): (Double, Double) = {
    val m = y / K0
    val mu = m / (R * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256))
    val e1 = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
    val phi1 = mu +
      (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = E2 / (1 - E2) * cosP * cosP
    val t1 = tanP * tanP
    val n1 = R / math.sqrt(1 - E2 * sinP * sinP)
    val r1 = R * (1 - E2) / math.pow(1 - E2 * sinP * sinP, 1.5)
    val d = x / (n1 * K0)
    val lat = phi1 - (n1 * tanP / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * E2 / (1 - E2)) * math.pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * E2 / (1 - E2) - 3 * c1 * c1) *
        math.pow(d, 6) / 720)
    val lon = (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * E2 / (1 - E2) + 24 * t1 * t1) *
        math.pow(d, 5) / 120) / cosP
    (lon0Deg + math.toDegrees(lon), math.toDegrees(lat))
  }

  private def meridianArc(lat: Double): Double =
    R * ((1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256) * lat -
      (3 * E2 / 8 + 3 * E2 * E2 / 32 + 45 * E2 * E2 * E2 / 1024) * math.sin(2 * lat) +
      (15 * E2 * E2 / 256 + 45 * E2 * E2 * E2 / 1024) * math.sin(4 * lat) -
      (35 * E2 * E2 * E2 / 3072) * math.sin(6 * lat))

  /** Transform a JTS geometry coordinate-wise. */
  def transformGeometry(g: org.locationtech.jts.geom.Geometry, src: CRS, dst: CRS): org.locationtech.jts.geom.Geometry = {
    if (src.normalized == dst.normalized) return g
    val out = g.copy()
    out.apply(new org.locationtech.jts.geom.CoordinateFilter {
      override def filter(c: org.locationtech.jts.geom.Coordinate): Unit = {
        val (nx, ny) = transform(c.x, c.y, src, dst)
        c.x = nx; c.y = ny
      }
    })
    out.geometryChanged()
    out
  }
}
