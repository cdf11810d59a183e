package graft.udt

import graft.core._
import graft.core.geotiff.GeoTiff

/**
 * Lazy tile: only (path, window, metadata) travels through the plan;
 * cell bytes are fetched on the executor at first cell access with a
 * process-wide bounded cache of parsed file handles. Mirrors the
 * reference's RasterRef (ref/RasterRef.scala:49-64) + its Caffeine
 * source cache (ref/RFRasterSource.scala:90-101) using a plain bounded
 * LinkedHashMap LRU (Caffeine is not on this classpath).
 */
final class RefTile(
    val path: String,
    val win: GridBounds,
    val cellType: CellType,
    val cols: Int,
    val rows: Int) extends Tile {

  @transient private var realized: Tile = _
  def isRealized: Boolean = realized != null

  private def tile: Tile = {
    if (realized == null)
      realized = RefTile.readWindow(path, win)
    realized
  }

  override def get(i: Int): Int = tile.get(i)
  override def getDouble(i: Int): Double = tile.getDouble(i)
  override def getRawDouble(i: Int): Double = tile.getRawDouble(i)
  override def toBytes: Array[Byte] = tile.toBytes
  override def mutableCopy: MutableTile = tile.mutableCopy
}

object RefTile {
  private final val MaxCached = 64
  // path -> (bytes, parsed info); bounded LRU, JVM-wide (one per executor)
  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, (Array[Byte], GeoTiff.Info)](MaxCached, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, (Array[Byte], GeoTiff.Info)]): Boolean =
          size() > MaxCached
      })

  private def entryFor(path: String): (Array[Byte], GeoTiff.Info) = {
    var entry = cache.get(path)
    if (entry == null) {
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
      entry = (bytes, GeoTiff.parseInfo(bytes))
      cache.put(path, entry)
    }
    entry
  }

  /** Cached metadata for a source file (executor-side). */
  def info(path: String): GeoTiff.Info = entryFor(path)._2

  def readWindow(path: String, win: GridBounds): Tile = {
    val entry = entryFor(path)
    GeoTiff.readWindow(entry._1, entry._2, win)
  }
}
