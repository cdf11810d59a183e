package graft.datasource

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * STAC catalog reader over LOCAL static catalogs (this environment has
 * zero egress, so the reference's HTTP STAC-API client —
 * /root/reference/datasource/src/main/scala/org/locationtech/rasterframes/datasource/stac/api/StacApiDataSource.scala:11-26
 * — becomes a filesystem walker over catalog.json → child links → item
 * JSONs). Output: one row per item `{id, collection, datetime, bbox,
 * geometry_wkt, asset_keys, asset_hrefs, properties_json}` — feed the
 * hrefs straight into the `raster` reader or
 * `rf_raster_source_to_tiles`.
 */
class StacDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "stac"

  override def createRelation(ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException("stac reader requires a 'path' to a catalog or item dir"))
    val rows = StacDataSource.readItems(root)
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = StacDataSource.schema
      override def buildScan(): RDD[Row] =
        ctx.sparkContext.parallelize(rows, math.max(1, rows.size / 64))
    }
  }
}

object StacDataSource {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("collection", StringType, nullable = true),
    StructField("datetime", StringType, nullable = true),
    StructField("bbox", ArrayType(DoubleType, containsNull = false), nullable = true),
    StructField("geometry_wkt", StringType, nullable = true),
    StructField("asset_keys", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("asset_hrefs", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("properties_json", StringType, nullable = true)))

  /** Walk a catalog: item files directly, or catalog/collection JSONs with
    * child/item links (relative hrefs resolved against the parent dir). */
  def readItems(path: String): Seq[Row] = {
    val visited = scala.collection.mutable.Set.empty[String]
    val items = scala.collection.mutable.ArrayBuffer.empty[Row]

    def visit(p: java.nio.file.Path): Unit = {
      val canonical = p.toAbsolutePath.normalize.toString
      if (!visited.add(canonical)) return
      if (java.nio.file.Files.isDirectory(p)) {
        java.nio.file.Files.list(p).iterator().asScala
          .filter(_.toString.endsWith(".json")).foreach(visit)
      } else if (java.nio.file.Files.exists(p)) {
        val node = GeomFromGeoJSON.readTree(
          new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
        Option(node.get("type")).map(_.asText()) match {
          case Some("Feature") => items += itemRow(node)
          case Some("Catalog") | Some("Collection") =>
            Option(node.get("links")).foreach(_.elements().asScala.foreach { link =>
              val rel = Option(link.get("rel")).map(_.asText()).getOrElse("")
              if (rel == "item" || rel == "child")
                visit(p.getParent.resolve(link.get("href").asText()).normalize)
            })
          case _ => ()
        }
      }
    }
    visit(java.nio.file.Paths.get(path))
    items.toSeq
  }

  private def itemRow(node: JsonNode): Row = {
    val props = Option(node.get("properties"))
    val assets = Option(node.get("assets")).map { a =>
      a.properties().asScala.toSeq.map(e =>
        (e.getKey, Option(e.getValue.get("href")).map(_.asText()).getOrElse("")))
    }.getOrElse(Seq.empty).sortBy(_._1)
    Row(
      node.get("id").asText(),
      Option(node.get("collection")).map(_.asText()).orNull,
      props.flatMap(p => Option(p.get("datetime")).map(_.asText())).orNull,
      Option(node.get("bbox")).map(b =>
        (0 until b.size()).map(i => b.get(i).asDouble())).orNull,
      Option(node.get("geometry")).map(g => GeomFromGeoJSON.fromNode(g).toText).orNull,
      assets.map(_._1),
      assets.map(_._2),
      props.map(_.toString).orNull)
  }
}
