package graft

import java.nio.file.Files

import graft.core.Extent
import graft.extensions._
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  def grid = Seq(0, 1, 2, 3).toDF("id")
    .select($"id",
      rf_synthetic_tile($"id", 32, 32, "float64").as("tile"),
      struct(($"id" % 2 * 10).cast("double").as("xmin"),
        expr("(id div 2) * 10").cast("double").as("ymin"),
        ($"id" % 2 * 10 + 10).cast("double").as("xmax"),
        expr("(id div 2) * 10 + 10").cast("double").as("ymax")).as("extent"),
      lit("epsg:4326").as("crs"))

  test("overview raster aggregates the full grid") {
    val pr = grid.select(rf_proj_raster($"tile", $"extent", $"crs").as("pr"))
    val out = pr.agg(rf_agg_overview_raster($"pr", 16, 16, Extent(0, 0, 20, 20), "epsg:4326").as("ov"))
      .select(rf_data_cells($"ov"), rf_dimensions($"ov").getField("cols")).collect()(0)
    assert(out.getLong(0) == 256L) // every overview cell covered by some tile
    assert(out.getInt(1) == 16)
  }

  test("rf_agg_extent composes to the union") {
    val e = grid.agg(rf_agg_extent($"extent").as("u")).select("u.*").collect()(0)
    assert(e.getDouble(0) == 0.0 && e.getDouble(1) == 0.0)
    assert(e.getDouble(2) == 20.0 && e.getDouble(3) == 20.0)
  }

  test("rf_local_algebra lifts a custom cell function") {
    val df = Seq((Seq(1.0, 2.0), Seq(10.0, 20.0))).toDF("a", "b")
      .select(rf_array_to_tile($"a", 2, 1).as("ta"), rf_array_to_tile($"b", 2, 1).as("tb"))
    val hypot = rf_local_algebra((x, y) => math.hypot(x, y)) _
    val r = df.select(rf_tile_to_array_double(hypot($"ta", $"tb"))).collect()(0).getSeq[Double](0)
    assert(r == Seq(math.hypot(1, 10), math.hypot(2, 20)))
  }

  test("toMarkdown and toHTML render tiles") {
    val md = grid.select($"id", $"tile").toMarkdown(2)
    assert(md.contains("float64 32×32"))
    val html = grid.select($"id", $"tile").toHTML(1)
    assert(html.contains("data:image/png;base64,"))
  }

  test("slippy writer produces a z/x/y pyramid") {
    val dir = Files.createTempDirectory("slippy").toString
    grid.select($"tile", $"extent", $"crs")
      .write.format("slippy").option("path", dir).option("zoom", "5").save()
    val z = new java.io.File(s"$dir/5")
    assert(z.exists() && z.listFiles().nonEmpty)
    val pngs = z.listFiles().flatMap(_.listFiles()).filter(_.getName.endsWith(".png"))
    assert(pngs.nonEmpty)
    assert(new java.io.File(s"$dir/index.html").exists())
  }

  test("slippy PNG pixels carry the min-max stretch; footprint masks to transparent") {
    // a two-valued tile (left half 0, right half 100) stretches to gray
    // ∈ {0, 255} exactly — decode the written PNGs and assert every
    // OPAQUE pixel is one of the two endpoints and both occur, while
    // pixels outside the footprint stay fully transparent
    val dir = Files.createTempDirectory("slippy-px").toString
    val cells = Array.tabulate(32 * 32)(i => if (i % 32 < 16) 0.0 else 100.0)
    Seq(1).toDF("id")
      .select(rf_array_to_tile(lit(cells), 32, 32).as("tile"),
        struct(lit(0.0).as("xmin"), lit(0.0).as("ymin"),
          lit(10.0).as("xmax"), lit(10.0).as("ymax")).as("extent"),
        lit("epsg:4326").as("crs"))
      .write.format("slippy").option("path", dir).option("zoom", "5").save()
    val pngs = new java.io.File(s"$dir/5").listFiles()
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".png"))
    assert(pngs.nonEmpty)
    val grays = scala.collection.mutable.Set.empty[Int]
    var transparent = 0L
    for (f <- pngs) {
      val img = javax.imageio.ImageIO.read(f)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val argb = img.getRGB(x, y)
        if ((argb >>> 24) == 0xff) {
          val g = argb & 0xff
          assert((argb >> 8 & 0xff) == g && (argb >> 16 & 0xff) == g, "gray channels")
          grays += g
        } else transparent += 1
      }
    }
    assert(grays == Set(0, 255), s"stretch endpoints only, got $grays")
    assert(transparent > 0, "outside-footprint pixels must be transparent")
  }
}
