package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

class StacSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("local STAC catalog walks to items with assets") {
    val dir = Files.createTempDirectory("stac").toString
    Files.write(Paths.get(s"$dir/catalog.json"),
      """{"type":"Catalog","id":"root","links":[
        |{"rel":"item","href":"item1.json"},{"rel":"child","href":"sub/collection.json"}]}""".stripMargin.getBytes)
    Files.createDirectories(Paths.get(s"$dir/sub"))
    Files.write(Paths.get(s"$dir/sub/collection.json"),
      """{"type":"Collection","id":"c1","links":[{"rel":"item","href":"item2.json"}]}""".getBytes)
    def item(id: String, lon: Double) =
      s"""{"type":"Feature","id":"$id","collection":"c1",
         |"bbox":[$lon,0,${lon+1},1],
         |"geometry":{"type":"Polygon","coordinates":[[[$lon,0],[${lon+1},0],[${lon+1},1],[$lon,1],[$lon,0]]]},
         |"properties":{"datetime":"2024-01-0${lon.toInt+1}T00:00:00Z"},
         |"assets":{"B1":{"href":"/data/$id-b1.tif"},"B2":{"href":"/data/$id-b2.tif"}}}""".stripMargin
    Files.write(Paths.get(s"$dir/item1.json"), item("i1", 0).getBytes)
    Files.write(Paths.get(s"$dir/sub/item2.json"), item("i2", 1).getBytes)

    val df = spark.read.format("stac").option("path", s"$dir/catalog.json").load()
    assert(df.count() == 2)
    val r = df.orderBy("id").collect()
    assert(r(0).getString(0) == "i1" && r(1).getString(0) == "i2")
    assert(r(0).getSeq[String](5) == Seq("B1", "B2"))
    assert(r(0).getSeq[String](6).head.endsWith("i1-b1.tif"))
    assert(r(0).getString(4).startsWith("POLYGON"))
    assert(r(1).getString(2) == "2024-01-02T00:00:00Z")
  }
}
