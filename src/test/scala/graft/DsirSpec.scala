package graft

import graft.pipeline.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance resampling (Xie et al. 2023): λ fit + top-K select. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    // "target-looking" docs share the quality vocabulary
    (1L, "tgt", "the quick brown fox jumps over the lazy dog"),
    (2L, "tgt", "the quick brown fox runs past the lazy dog"),
    (3L, "tgt", "a quick brown fox and a lazy dog meet the farmer"),
    // raw-only docs use disjoint junk vocabulary
    (4L, "raw", "zzz spam spam click here buy now cheap pills"),
    (5L, "raw", "spam click buy cheap now zzz pills here"),
    (6L, "raw", "unrelated words about metal pipes and flanges"),
    // a raw doc written in target vocabulary — should outscore the junk
    (7L, "raw", "the quick brown fox naps beside the lazy dog")
  ).toDF("id", "split", "text")

  test("target-vocabulary docs outscore junk docs; ranks are dense") {
    val top = Dsir.topK(corpus, "id", "text", isTarget = $"split" === "tgt",
      buckets = 256, k = 7).collect()
    assert(top.length == 7)
    assert(top.map(_.getInt(2)).toSeq == (1 to 7))
    val score = top.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 7 shares the target vocabulary: must beat every junk doc
    assert(score(7L) > score(4L) && score(7L) > score(5L) && score(7L) > score(6L))
    // junk docs score negative (their tokens are raw-only)
    assert(score(4L) < 0 && score(5L) < 0)
  }

  test("lambda table is bounded by bucket count and integer-valued") {
    val lam = Dsir.lambdaTable(corpus, "text", $"split" === "tgt", 64).collect()
    assert(lam.length <= 64)
    assert(lam.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 64))
  }

  test("buckets must be a power of two (unsigned-mod parity with the oracle)") {
    intercept[IllegalArgumentException] {
      Dsir.lambdaTable(corpus, "text", $"split" === "tgt", 100).collect()
    }
  }

  test("docs with no ASCII-alnum tokens score exactly zero") {
    val zh = Seq((1L, true, "the common words appear here"),
      (2L, false, "你好 世界 这是 中文")).toDF("id", "tgt", "text")
    val out = Dsir.topK(zh, "id", "text", isTarget = $"tgt", buckets = 64, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) == 0L)
  }

  test("scoring plan has no join and no shuffle (score-in-the-scan)") {
    val lamFit = Dsir.topK(corpus, "id", "text", $"split" === "tgt", 64, 3)
    val plan = lamFit.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join"), plan)
    // the only exchanges allowed are the TakeOrdered machinery + the
    // 3-row rank window; the token stream itself must not shuffle
    assert(!plan.contains("HashAggregate"), plan)
  }
}
