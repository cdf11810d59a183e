package graft.datasource

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.expressions._
import graft.udt.GeometryUDT
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types._
import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory}

/**
 * GeoJSON FeatureCollection reader (reference:
 * /root/reference/datasource/src/main/scala/org/locationtech/rasterframes/datasource/geojson/GeoJsonDataSource.scala:43-131):
 * rows of {geometry, <inferred property columns>}. Property schema
 * inference is delegated to Spark's JSON reader; geometries are decoded
 * by [[GeomFromGeoJSON]].
 */
object GeoJson {
  /** Features are split with Jackson (Spark's JSON schema inference can't
    * unify the heterogeneous nesting of GeoJSON `coordinates`); property
    * schema inference is then delegated to Spark's JSON reader over the
    * properties objects alone. Like `spark.read.json`, inference is one
    * eager pass now and the returned frame re-parses lazily — nothing is
    * cached, so repeated reads don't accumulate executor-memory state. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val texts = spark.read.option("wholetext", "true").text(path).as[String]
    val features = texts.flatMap { txt =>
      val root = GeomFromGeoJSON.readTree(txt)
      val fs = root.get("features")
      require(fs != null && fs.isArray,
        "GeoJSON input must be a FeatureCollection with a 'features' array")
      (0 until fs.size()).map { i =>
        val f = fs.get(i)
        (f.get("geometry").toString,
          Option(f.get("properties")).map(_.toString).getOrElse("{}"))
      }
    }.toDF("geom_json", "props_json")
    val propSchema = spark.read.json(features.select("props_json").as[String]).schema
    val propCols = propSchema.fieldNames.toSeq.map(n => col(s"p.$n").as(n))
    features.select(
      (asColumn(GeomFromGeoJSON(asExpr(col("geom_json")))).as("geometry") +:
        from_json(col("props_json"), propSchema).as("p") +: Nil): _*)
      .select((col("geometry") +: propCols): _*)
  }
}

/** Parse a GeoJSON geometry object (string) into a JTS geometry. */
case class GeomFromGeoJSON(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "st_geomfromgeojson"
  override def dataType: DataType = GeometryUDT.instance
  override def nullSafeEval(input: Any): Any =
    GeometryUDT.write(GeomFromGeoJSON.parse(input.toString))
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

object GeomFromGeoJSON {
  private val gf = new GeometryFactory()
  private lazy val mapper = new ObjectMapper()

  def readTree(json: String): JsonNode = mapper.readTree(json)

  def parse(json: String): Geometry = {
    val node = mapper.readTree(json)
    fromNode(node)
  }

  private def coord(n: JsonNode): Coordinate =
    new Coordinate(n.get(0).asDouble(), n.get(1).asDouble())
  private def coords(n: JsonNode): Array[Coordinate] = {
    val out = new Array[Coordinate](n.size())
    var i = 0
    while (i < n.size()) { out(i) = coord(n.get(i)); i += 1 }
    out
  }
  private def polygon(rings: JsonNode): org.locationtech.jts.geom.Polygon = {
    val shell = gf.createLinearRing(coords(rings.get(0)))
    val holes = (1 until rings.size()).map(i => gf.createLinearRing(coords(rings.get(i)))).toArray
    gf.createPolygon(shell, holes)
  }

  def fromNode(node: JsonNode): Geometry = {
    val c = node.get("coordinates")
    node.get("type").asText() match {
      case "Point" => gf.createPoint(coord(c))
      case "MultiPoint" => gf.createMultiPointFromCoords(coords(c))
      case "LineString" => gf.createLineString(coords(c))
      case "MultiLineString" =>
        gf.createMultiLineString(
          (0 until c.size()).map(i => gf.createLineString(coords(c.get(i)))).toArray)
      case "Polygon" => polygon(c)
      case "MultiPolygon" =>
        gf.createMultiPolygon((0 until c.size()).map(i => polygon(c.get(i))).toArray)
      case "GeometryCollection" =>
        val gs = node.get("geometries")
        gf.createGeometryCollection((0 until gs.size()).map(i => fromNode(gs.get(i))).toArray)
      case t => throw new IllegalArgumentException(s"Unsupported GeoJSON geometry type: $t")
    }
  }
}

class GeoJsonDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "geojson"
  override def createRelation(ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val df = GeoJson.read(ctx.sparkSession, parameters.getOrElse("path",
      throw new IllegalArgumentException("geojson reader requires a 'path'")))
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }
  }
}
