package graft

import graft.pipeline.Stats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("anomalyFlags agrees with the float z-score on a hand case") {
    // group a: values 10,10,10,10,100 — 100 is the obvious outlier
    val df = Seq(("a", 10L), ("a", 10L), ("a", 10L), ("a", 10L), ("a", 100L),
      ("b", 5L), ("b", 7L)).toDF("k", "v")
    val out = Stats.anomalyFlags(df, Seq("k"), "v", kNum = 3, kDen = 2)
      .select("k", "v", "is_anomaly").orderBy("k", "v").collect()
    val flags = out.map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq
    // float z for 100 in group a: mean=28, sigma=sqrt((5*10400-140^2)/25)=36 -> z=2
    assert(flags == Seq(
      ("a", 10L, false), ("a", 10L, false), ("a", 10L, false),
      ("a", 10L, false), ("a", 100L, true),
      ("b", 5L, false), ("b", 7L, false)))
  }

  test("anomalyFlags matches the float z-score gate on random data") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 2000).map(i =>
      (s"g${rnd.nextInt(8)}", (rnd.nextGaussian() * 100).round + 500))
    val df = rows.toDF("k", "v")
    val got = Stats.anomalyFlags(df, Seq("k"), "v", kNum = 2, kDen = 1)
      .select("k", "v", "is_anomaly").as[(String, Long, Boolean)]
      .collect().toSeq.sorted
    // float reference; strict > on z^2 comparison mirrors the gate
    val byK = rows.groupBy(_._1)
    val want = rows.map { case (k, v) =>
      val vs = byK(k).map(_._2.toDouble)
      val n = vs.size.toDouble
      val s = vs.sum; val ssq = vs.map(x => x * x).sum
      (k, v, (n * v - s) * (n * v - s) > 4.0 * (n * ssq - s * s))
    }.sorted
    assert(got == want)
  }

  test("singleton groups never flag") {
    val df = Seq(("x", 99L)).toDF("k", "v")
    val out = Stats.anomalyFlags(df, Seq("k"), "v")
      .select("is_anomaly", "dev2", "var_n2").collect()
    assert(out.length == 1 && !out(0).getBoolean(0)
      && out(0).getLong(1) == 0L && out(0).getLong(2) == 0L)
  }

  test("the moment join broadcasts instead of reshuffling the fact side") {
    val df = (1 to 1000).map(i => (s"g${i % 4}", i.toLong)).toDF("k", "v")
    val plan = Stats.anomalyFlags(df, Seq("k"), "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("AdaptiveSparkPlan"),
      s"moment join should broadcast:\n$plan")
  }
}
