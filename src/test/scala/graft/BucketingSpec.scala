package graft

import java.nio.file.Files

import graft.extensions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located-join story: bucketed catalog tables must equi-join
  * and aggregate with ZERO exchanges — at 100 TB the write-time shuffle
  * is paid once and every later join on the bucket key is local. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def withNoAutoBroadcast[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed tables equi-join and aggregate with zero exchanges") {
    val dir = Files.createTempDirectory("graft-bucketed").toString
    val facts = (1 to 5000).map(i => (i.toLong % 97, i.toLong)).toDF("k", "v")
    val dims = (0 to 96).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    facts.saveBucketedTable("g_buck_facts", "k", 8, s"$dir/facts")
    dims.saveBucketedTable("g_buck_dims", "k", 8, s"$dir/dims")
    try withNoAutoBroadcast {
      val joined = spark.table("g_buck_facts")
        .join(spark.table("g_buck_dims"), "k")
        .groupBy("k", "name").agg(sum("v").as("total"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must be exchange-free, got:\n$plan")
      // and it computes the right thing
      val row = joined.where(col("k") === 5).head()
      assert(row.getString(1) == "name5")
      assert(row.getLong(2) == (1 to 5000).filter(_ % 97 == 5).map(_.toLong).sum)
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_buck_facts")
      spark.sql("DROP TABLE IF EXISTS g_buck_dims")
    }
  }

  test("mismatched bucket counts fall back to a planned exchange (no wrong results)") {
    val dir = Files.createTempDirectory("graft-bucketed2").toString
    val a = (1 to 100).map(i => (i.toLong % 7, i.toLong)).toDF("k", "v")
    a.saveBucketedTable("g_buck_a8", "k", 8, s"$dir/a8")
    a.saveBucketedTable("g_buck_a4", "k", 4, s"$dir/a4")
    try withNoAutoBroadcast {
      val j = spark.table("g_buck_a8").join(
        spark.table("g_buck_a4").withColumnRenamed("v", "v2"), "k")
      assert(j.count() > 0) // correctness regardless of bucket layout
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_buck_a8")
      spark.sql("DROP TABLE IF EXISTS g_buck_a4")
    }
  }
}
