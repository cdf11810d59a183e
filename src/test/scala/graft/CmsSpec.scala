package graft

import graft.pipeline.{Cms, CmsHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CmsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def skewed = {
    val rnd = new scala.util.Random(17)
    // zipf-ish: key k appears ~ 1000/k times
    (1 to 40).flatMap(k => Seq.fill(1000 / k)(k.toLong)) ++
      (1 to 500).map(_ => rnd.nextInt(10000).toLong + 100L)
  }

  test("estimates never undercount; exact keys match in a wide sketch") {
    val df = skewed.toDF("k")
    val sk = df.agg(Cms.sketch(col("k"), 4, 1024).as("sk"))
    val out = df.groupBy("k").agg(count(lit(1)).as("exact"))
      .crossJoin(broadcast(sk))
      .select(col("k"), col("exact"),
        Cms.estimate(col("sk"), col("k"), 4, 1024).as("est"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(2) >= r.getLong(1)),
      out.filter(r => r.getLong(2) < r.getLong(1)).mkString(","))
    // heavy keys (count >= 100) should estimate exactly in a 4x1024
    // sketch over this few distinct keys — collisions would need to
    // hit the same bucket in all four rows
    val heavy = out.filter(_.getLong(1) >= 100)
    assert(heavy.nonEmpty && heavy.forall(r => r.getLong(2) == r.getLong(1)))
  }

  test("sketch is partitioning-invariant (ADD-merge associativity)") {
    val df = skewed.toDF("k")
    val one = df.repartition(1).agg(Cms.sketch(col("k"), 4, 256)).head.getSeq[Long](0)
    val many = df.repartition(13).agg(Cms.sketch(col("k"), 4, 256)).head.getSeq[Long](0)
    assert(one == many)
    assert(one.sum == 4L * skewed.size) // every row increments once per sketch row
  }

  test("SQL surface: pl_cms_agg + pl_cms_estimate round-trip") {
    Raster.init(spark)
    skewed.toDF("k").createOrReplaceTempView("cms_in")
    val rows = spark.sql(
      """WITH sk AS (SELECT pl_cms_agg(k, 4, 256) AS s FROM cms_in),
        |e AS (SELECT k, COUNT(*) AS exact FROM cms_in GROUP BY k)
        |SELECT SUM(CASE WHEN pl_cms_estimate(s, k, 4, 256) >= exact THEN 0 ELSE 1 END)
        |FROM e CROSS JOIN sk""".stripMargin).head.getLong(0)
    assert(rows == 0L)
  }

  test("shape validation: non-power-of-two width and bad depth fail fast") {
    intercept[IllegalArgumentException](CmsHash.requireShape(4, 1000))
    intercept[IllegalArgumentException](CmsHash.requireShape(0, 1024))
    intercept[IllegalArgumentException](Cms.estimate(lit(Array(0L)), lit(1L), 4, 100))
  }
}
