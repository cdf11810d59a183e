package graft.tools
object MicroProbe {
  def main(args: Array[String]): Unit = {
    def time(body: => Unit): Double = { val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9 }
    def perOp(n: Int)(body: => Unit): Double = {
      var i = 0; while (i < n) { body; i += 1 }
      (1 to 3).map(_ => time { var j = 0; while (j < n) { body; j += 1 } }).min / n
    }
    val mk = (seed: Long, ct: String) => {
      val rnd = new scala.util.Random(seed)
      val t = graft.core.Tile.empty(graft.core.CellType.fromName(ct), 512, 512)
      var i = 0; while (i < 512 * 512) { t.setDouble(i, rnd.nextInt(65535).toDouble); i += 1 }
      t: graft.core.Tile
    }
    val (r, g, b) = (mk(1, "uint16"), mk(2, "uint16"), mk(3, "uint16"))
    val rr = graft.udt.TileUDT.encode(r); val gr = graft.udt.TileUDT.encode(g); val br = graft.udt.TileUDT.encode(b)
    val renderExpr = graft.expressions.RenderRGBPNG(graft.expressions.RGBComposite(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0, graft.udt.TileUDT.instance.sqlType, nullable = false),
      org.apache.spark.sql.catalyst.expressions.BoundReference(1, graft.udt.TileUDT.instance.sqlType, nullable = false),
      org.apache.spark.sql.catalyst.expressions.BoundReference(2, graft.udt.TileUDT.instance.sqlType, nullable = false)))
    val row = org.apache.spark.sql.catalyst.InternalRow(rr, gr, br)
    var sink: Any = null
    println(f"render_png: ${perOp(5) { sink = renderExpr.eval(row) }}%.4f s/op (baseline 0.3977)")
    val tile = mk(7, "float64")
    println(f"tile_encode_512: ${perOp(500) { sink = graft.udt.TileUDT.encode(tile) } * 1e6}%.1f us/op (baseline 1080.8)")
    println(f"tile_roundtrip_512: ${perOp(500) { sink = graft.udt.TileUDT.decode(graft.udt.TileUDT.encode(tile)) } * 1e6}%.1f us/op (baseline 3401.0)")
    val codes = Array("epsg:4326", "EPSG:3857", "epsg:32633", "epsg:32718")
    var acc = 0
    println(f"crs_parse: ${perOp(1000000) { val c = graft.core.crs.CRS(codes(acc & 3)); if (graft.core.crs.CRS.isSupported(c)) acc += c.epsg.get & 7 else acc += 1 } * 1e6}%.4f us/op (baseline 13.08)")
    val a = graft.core.crs.CRS("epsg:4326"); val b2 = graft.core.crs.CRS("EPSG:4326")
    println(f"crs_equals_warm: ${perOp(1000000) { if (a.normalized == b2.normalized) acc += 1 } * 1e6}%.4f us/op (baseline 0.037)")
    println(s"sink=${sink != null} acc=$acc")
  }
}
