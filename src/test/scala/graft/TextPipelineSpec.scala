package graft

import graft.pipeline.{EmbeddingDedup, TextFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("language_id identifies clear-cut samples across the profile set") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with his food"),
      ("es", "el perro corre por la calle y se esconde en un rincón del parque"),
      ("de", "der hund läuft nicht auf die straße und ist mit dem ball zufrieden"),
      ("fr", "le chien court dans la rue et les enfants sont pour une pause"),
      ("it", "il gatto dorme per non sentire la pioggia che cade nel giardino"),
      ("pt", "o gato dorme em um canto da casa para não ouvir o barulho"),
      ("nl", "de kat slaapt op het kussen en is niet bang voor een hond"),
      ("ru", "и он не знал что это было на самом деле но как всегда"),
      ("zh", "我 在 这 中 看 到 了 他 的 大 国"),
      ("und", "zxqv wvut kjhr pqmn"))
    val out = samples.toDF("expected", "text")
      .select($"expected", TextFunctions.language_id($"text").as("guess"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    val wrong = out.filter { case (e, g) => e != g }
    assert(wrong.isEmpty, s"misidentified: ${wrong.mkString(", ")}")
  }

  test("embedding-cosine near-dup finds planted duplicates, not noise") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dupes = emb.limit(10)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding", $"label")
    val corpus = emb.union(dupes)
    val pairs = EmbeddingDedup.cosinePairs(corpus, "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every planted exact duplicate pair is found
    for (i <- 0L until 10L)
      assert(pairs.contains((i, i + 100000L)), s"missing planted pair $i")
    // keep-decisions collapse each planted pair to the original id
    val keep = EmbeddingDedup.keepDecisions(corpus, "vec_id", "embedding", threshold = 0.999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0L until 10L) assert(keep(i + 100000L) == i)
  }
}
