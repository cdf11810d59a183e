package graft

import graft.pipeline.{Dedup, Similarity}
import graft.tools.Stress
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards the stress harness's replication claims (README "Synthetic
  * second decade"): perturbed copies must preserve the statistics that
  * drive operator cost, or the 16× timings measure a corpus that cannot
  * exist. Uses sf0.001 so the checks are exact and fast. */
class StressSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("doc replication keeps the duplicate rate factor-invariant") {
    val one = Stress.replicateDocs(spark, sf, 1)
    val two = Stress.replicateDocs(spark, sf, 2)
    assert(two.count() == 2 * one.count())
    // near-dup pair count scales EXACTLY with the factor: every pair
    // stays within its copy (alphabet rotation shares no shingles)
    val p1 = Dedup.minhashPairs(one, "doc_id", "text").count()
    val p2 = Dedup.minhashPairs(two, "doc_id", "text")
    assert(p2.count() == 2 * p1, "cross-copy minhash pairs leaked")
    // and no pair straddles the copy-id ranges
    assert(p2.where(col("a_id") < 10000000L && col("b_id") >= 10000000L).count() == 0)
  }

  test("embedding replication preserves norms, decorrelates cross-copy cosines") {
    val two = Stress.replicateEmbeddings(spark, sf, 2)
    val vecs = two.select(col("vec_id"), col("embedding").as("v"),
      Similarity.l2_norm(col("embedding")).as("n"))
    // sign flips are norm-preserving: copy k's norms equal copy 0's
    val norms = vecs.select((col("vec_id") % 10000000L).as("base"),
        (col("vec_id") >= 10000000L).as("copy"), col("n"))
      .groupBy("base").agg(countDistinct("n").as("d")).agg(max("d")).collect()(0).getLong(0)
    assert(norms == 1L, "sign-flip pattern changed a vector norm")
    // a vector and its flipped copy are far apart in cosine (the flip
    // pattern negates ~3/7 of the mass): nothing near the 0.97 semdedup
    // or 0.95 near-dup thresholds
    val pairs = vecs.where(col("vec_id") < 10000000L)
      .select(col("vec_id").as("id"), col("v").as("a"))
      .join(vecs.where(col("vec_id") >= 10000000L)
        .select((col("vec_id") - 10000000L).as("id"), col("v").as("b")), Seq("id"))
      .select(Similarity.cosine(col("a"), col("b")).as("sim"))
      .agg(max(abs(col("sim")))).collect()(0).getDouble(0)
    assert(pairs < 0.9, s"cross-copy cosine too high: $pairs")
  }

  test("event replication keeps per-user event counts identical") {
    val two = Stress.replicateEvents(spark, sf, 2)
    val dens = two.groupBy((col("user_id") % 1000000L).as("u"),
        (col("user_id") >= 1000000L).as("copy"))
      .count()
      .groupBy("u").agg(countDistinct("count").as("d"))
      .agg(max("d")).collect()(0).getLong(0)
    assert(dens == 1L, "per-user event density changed across copies")
  }
}
