package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * The r20 sortOnce/repartSort rewrite (SparkEntry.ckptSort /
 * repartSort) must be invisible in results: same rows, same ORDER as
 * the plain global sort it replaces — the driver's oracle hash is
 * order-sensitive through the declared sort keys. Checked end-to-end
 * on representatives of each rewrite class at sf0.001, plus the
 * structural claim (the rewritten plan is a global Sort whose child is
 * a checkpoint RDD, so the range sampler cannot re-execute the
 * pipeline).
 */
class SortOnceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  // one ckptSort name per family + one repartSort name
  private val reps = Seq("q_tile_minmax", "q_math", "q_acf", "q_wordpiece",
    "q_terrain", "q_resample")

  test("rewritten queries return bit-identical rows in identical order") {
    for (n <- reps) {
      val got = SparkEntry.queries(n)(spark, sfDir).collect().toSeq
      val want = SparkEntry.queriesPlain(n)(spark, sfDir).collect().toSeq
      assert(got == want, s"$n: rewrite changed rows or order")
    }
  }

  test("ckptSort rewrites to a global Sort over a checkpoint RDD") {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sort}
    val df = SparkEntry.queries("q_tile_minmax")(spark, sfDir)
    df.queryExecution.analyzed match {
      case s: Sort =>
        assert(s.global, "rewritten sort must stay global")
        assert(s.child.getClass.getSimpleName == "LogicalRDD",
          s"expected the pre-sort child materialized as an RDD, " +
            s"got ${s.child.getClass.getSimpleName}")
      case other: LogicalPlan =>
        fail(s"expected a top-level Sort, got ${other.getClass.getSimpleName}")
    }
  }
}
