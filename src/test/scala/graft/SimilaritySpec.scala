package graft

import graft.pipeline.Similarity
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  def embeddings = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("IVF and LSH recall against the brute-force baseline") {
    val brute = Similarity.bruteTopK(embeddings, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(embeddings, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(embeddings, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = (brute & ivf).size.toDouble / brute.size
    val lshRecall = (brute & lsh).size.toDouble / brute.size
    info(f"IVF recall@3 = $ivfRecall%.3f, LSH recall@3 = $lshRecall%.3f")
    // IVF approximates global top-k even on weak-structure data; LSH's
    // contract is HIGH-similarity retrieval (tested below), so its
    // recall on near-random embeddings is expectedly low.
    assert(ivfRecall > 0.2, s"IVF recall $ivfRecall")
    // every query still gets k results from IVF (nprobe cells are never empty)
    val perQuery = Similarity.ivfTopK(embeddings, "vec_id", "embedding", 3)
      .groupBy("query_id").count().select("count").distinct().collect()
    assert(perQuery.forall(_.getLong(0) == 3L))
  }

  test("IVF+PQ composition scores like exhaustive PQ within probed cells") {
    import org.apache.spark.sql.functions._
    val df = Similarity.ivfpqTopK(embeddings, "vec_id", "embedding", 3)
    val ivfpq = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the SAME (query, neighbor) pair must carry the exact same ADC
    // score as the exhaustive PQ scan — the IVF stage only restricts
    // candidates, never changes the scorer
    val pqPairs = Similarity.pqTopK(embeddings, "vec_id", "embedding", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val shared = ivfpq.keySet & pqPairs.keySet
    assert(shared.nonEmpty, "expected some overlap between ivfpq and pq top-3")
    shared.foreach { p =>
      assert(ivfpq(p) == pqPairs(p), s"ADC score mismatch for $p")
    }
    val perQuery = df.groupBy("query_id").count()
      .select("count").distinct().collect()
    assert(perQuery.forall(_.getLong(0) == 3L))
    // run-to-run determinism (seeded sample + pinned Lloyd)
    val again = Similarity.ivfpqTopK(embeddings, "vec_id", "embedding", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(again == ivfpq)
    // the plan must not contain a cartesian over the corpus — the only
    // broadcast NLJ is the nlist-row centroid probe ranking
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("IVF quantizer sample-fit is deterministic and keeps k results per query") {
    import org.apache.spark.sql.functions._
    // fitSampleSize below the corpus size forces the seeded-sample path
    def run() = Similarity.ivfTopK(embeddings, "vec_id", "embedding", 3, fitSampleSize = 200)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = run()
    assert(run() == first, "seeded sample + seeded KMeans must be run-to-run deterministic")
    val perQuery = Similarity.ivfTopK(embeddings, "vec_id", "embedding", 3, fitSampleSize = 200)
      .groupBy("query_id").count().select("count").distinct().collect()
    assert(perQuery.forall(_.getLong(0) == 3L))
  }

  test("lshTopK shuffles id pairs, not duplicated vector payloads") {
    import graft.expressions.{asColumn, asExpr}
    import graft.pipeline.HyperplaneBucket
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    def measureShuffle(body: => Unit): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) total.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try { body; Thread.sleep(1500) } // let straggler listener events drain
      finally spark.sparkContext.removeSparkListener(listener)
      total.get()
    }

    // planted duplicates collide in every table → worst-case candidate dup
    val dupes = embeddings.limit(50)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val corpus = embeddings.union(dupes)

    // the pre-fix shape: d-dim vectors ride through the bucket join AND
    // the distinct, once per table collision
    def oldShape(): Unit = {
      val withBuckets = corpus.select(col("vec_id").as("id"), col("embedding").as("vec"),
        array((0 until 8).map(t =>
          asColumn(HyperplaneBucket(asExpr(col("embedding")), 64, 8, 0x5eed0000L + t))): _*).as("buckets"))
      val exploded = withBuckets.select(col("id"), col("vec"),
        posexplode(col("buckets")).as(Seq("table_idx", "bucket")))
      val a = exploded.select(col("id").as("query_id"), col("vec").as("a_vec"),
        col("table_idx"), col("bucket"))
      val b = exploded.select(col("id").as("neighbor_id"), col("vec").as("b_vec"),
        col("table_idx"), col("bucket"))
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
      a.join(b, Seq("table_idx", "bucket"))
        .where(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"), col("a_vec"), col("b_vec"))
        .distinct()
        .select(col("query_id"), col("neighbor_id"),
          Similarity.cosine(col("a_vec"), col("b_vec")).as("sim"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .write.mode("overwrite").format("noop").save()
    }

    val newRows = Similarity.lshTopK(corpus, "vec_id", "embedding", 3)
    val newBytes = measureShuffle {
      newRows.write.mode("overwrite").format("noop").save()
    }
    val oldBytes = measureShuffle(oldShape())
    info(s"shuffle bytes: new=$newBytes old=$oldBytes")
    assert(newBytes < oldBytes / 2,
      s"id-pair distinct should shuffle far less than payload distinct: $newBytes vs $oldBytes")
  }

  test("LSH recovers near-duplicate vectors") {
    import org.apache.spark.sql.functions._
    // plant exact duplicates: same hyperplane signs → same bucket in every table
    val dupes = embeddings.limit(20)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    val corpus = embeddings.union(dupes)
    val found = Similarity.lshTopK(corpus, "vec_id", "embedding", 1)
      .where(col("query_id") >= 100000L)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0) - 100000L, r.getLong(1))).toMap
    // every planted duplicate finds its original as the top neighbor
    assert((0L until 20L).forall(i => found.get(i).contains(i)), found.toString)
  }

  test("meanPool is bit-identical across partitionings (pinned fold order)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 120L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * (if (rnd.nextBoolean()) 1 else -1))))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("doc", expr("vec_id % 7"))
    def pooled(parts: Int): Map[Long, Seq[Double]] =
      Similarity.meanPool(df.repartition(parts), "doc", "vec_id", "embedding")
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val a = pooled(1)
    val b = pooled(13)
    assert(a.keySet == b.keySet)
    for (k <- a.keySet) assert(
      a(k).zip(b(k)).forall { case (x, y) => x == y }, s"doc $k differs")
    // hand-checked fixture: mean of [1,3] and [2,5] in vec_id order
    val tiny = Seq((0L, Array(1f, 3f)), (1L, Array(2f, 5f)))
      .toDF("vec_id", "embedding").withColumn("doc", lit(0L))
    val m = Similarity.meanPool(tiny, "doc", "vec_id", "embedding")
      .head().getSeq[Double](1)
    assert(m == Seq(1.5, 4.0))
  }

  test("int8 quantization: codes bounded, reconstruction error <= scale/2") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5)
    val vecs = (1 to 50).map(i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 10f)))
    val df = spark.createDataFrame(vecs).toDF("id", "v")
      .withColumn("v", col("v").cast("array<double>"))
      .withColumn("scale", Similarity.int8Scale(col("v")))
      .withColumn("codes", Similarity.quantizeInt8(col("v"), col("scale")))
      .withColumn("deq", Similarity.dequantizeInt8(col("codes"), col("scale")))
    val bad = df.where(
      array_max(col("codes")) > 127 || array_min(col("codes")) < -127 ||
        exists(zip_with(col("v"), col("deq"), (a, b) => abs(a - b)),
          e => e > col("scale") / 2 + lit(1e-12)))
      .count()
    assert(bad == 0)
    // all-zero vector: scale clamps to 1, codes all zero
    val z = spark.createDataFrame(Seq((1L, Array(0f, 0f)))).toDF("id", "v")
      .withColumn("scale", Similarity.int8Scale(col("v")))
      .withColumn("codes", Similarity.quantizeInt8(col("v"), col("scale")))
      .head()
    assert(z.getDouble(2) == 1.0 && z.getSeq[Int](3) == Seq(0, 0))
  }

  test("rrfFuse: agreement wins, ties break to the lower neighbor id") {
    import spark.implicits._
    // list A ranks (q=1): n=10 first, n=11 second; list B: n=11 first,
    // n=12 second. n=11 fuses 1e6/62 + 1e6/61 = 16129+16393 = 32522,
    // n=10 = 16393, n=12 = 16129 — fused order: 11, 10, 12
    val a = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.rrfFuse(Seq(a, b), k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(11L, 10L, 12L))
    assert(out.map(_.getLong(2)).toSeq == Seq(32522L, 16393L, 16129L))
    // equal scores (two singleton lists at the same rank) tie by id
    val c = Seq((2L, 20L, 1)).toDF("query_id", "neighbor_id", "rank")
    val d = Seq((2L, 19L, 1)).toDF("query_id", "neighbor_id", "rank")
    val tie = Similarity.rrfFuse(Seq(c, d), k = 2).orderBy("rank").collect()
    assert(tie.map(_.getLong(1)).toSeq == Seq(19L, 20L))
  }

  test("ndcgK: perfect, inverted and disjoint lists score as expected") {
    import spark.implicits._
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val results = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),  // perfect
      (2L, 22L, 1), (2L, 21L, 2), (2L, 20L, 3),  // inverted
      (3L, 90L, 1), (3L, 91L, 2), (3L, 92L, 3))  // disjoint
      .toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.ndcgK(results, truth, 3)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // idcg = 3*1000000 + 2*630930 + 1*500000 = 4761860
    assert(out(0) == ((1L, 4761860L, 1000L)))
    // inverted: 1*1000000 + 2*630930 + 3*500000 = 3761860 -> 789 permille
    assert(out(1) == ((2L, 3761860L, 789L)))
    assert(out(2) == ((3L, 0L, 0L)))
  }

  test("hardNegatives: best same/different-label cellmates, deterministic ties") {
    import spark.implicits._
    // 2D vectors in two tight clusters (one IVF run keeps them in
    // distinct cells with nlist=2): cluster A = ids 1,2,3 (labels 0,0,1),
    // cluster B = ids 10,11 (labels 1,1)
    val rows = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.99f, 0.1f), 0),
      (3L, Array(0.98f, 0.05f), 1),
      (10L, Array(0.0f, 1.0f), 1), (11L, Array(0.1f, 0.99f), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, "vec_id", "embedding", "label",
        nlist = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // id 1 (label 0): positive = 2 (same label), negative = 3
    assert(got(1L).getLong(2) == 2L && got(1L).getLong(4) == 3L)
    // id 3 (label 1): no same-label cellmate -> NULL positive; negative
    // is its most similar other-label mate
    assert(got(3L).isNullAt(2) && !got(3L).isNullAt(4))
    // id 10 (label 1): positive = 11, no other-label cellmate -> NULL neg
    assert(got(10L).getLong(2) == 11L && got(10L).isNullAt(4))
    // every anchor with a cellmate appears
    assert(got.size == 5)
  }

  test("hardNegatives: maxCellMates caps the neighbor side to the lowest ids") {
    import spark.implicits._
    // one tight cluster (nlist=1 -> everyone shares the cell): ids 1..5,
    // labels alternate. With maxCellMates=2 only ids 1 and 2 are eligible
    // mates; anchors are never dropped.
    val rows = Seq(
      (1L, Array(1.0f, 0.00f), 0), (2L, Array(1.0f, 0.01f), 1),
      (3L, Array(1.0f, 0.02f), 0), (4L, Array(1.0f, 0.03f), 1),
      (5L, Array(1.0f, 0.04f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, "vec_id", "embedding", "label",
        nlist = 1, maxCellMates = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // all 5 anchors survive (each has at least one eligible mate)
    assert(got.size == 5)
    // every reported positive/negative id is drawn from {1, 2}
    for ((id, r) <- got) {
      if (!r.isNullAt(2)) assert(Set(1L, 2L).contains(r.getLong(2)),
        s"anchor $id positive ${r.getLong(2)} escaped the mate cap")
      if (!r.isNullAt(4)) assert(Set(1L, 2L).contains(r.getLong(4)),
        s"anchor $id negative ${r.getLong(4)} escaped the mate cap")
    }
    // anchor 5 (label 0): positive must be 1 (only same-label mate in
    // the cap set), negative must be 2
    assert(got(5L).getLong(2) == 1L && got(5L).getLong(4) == 2L)
    // anchor 1: its own id is excluded; positive from {2}? no — label 0
    // needs same-label: ids {3,5} are capped away -> NULL positive
    assert(got(1L).isNullAt(2) && got(1L).getLong(4) == 2L)
  }

  test("randomProjection: exact integers, sign matrix from the seed") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq((1L, Array(0.5f, -0.25f, 0.0f))).toDF("id", "v")
    val got = df.select(Similarity.randomProjection(col("v"), 4, 7L).as("y"))
      .collect()(0).getSeq[Long](0)
    // replicate: q = floor(v*1024) = (512, -256, 0); sign from bit 0 of
    // mix64(7 + i*4 + j)
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val qs = Seq(512L, -256L, 0L)
    val exp = (0 until 4).map { j =>
      qs.zipWithIndex.map { case (q, i) =>
        if ((mix(7L + i * 4 + j) & 1L) == 0L) q else -q
      }.sum
    }
    assert(got == exp, s"got=$got exp=$exp")
    // projections are linear: scaling the vector by 2 doubles the sketch
    val df2 = Seq((1L, Array(1.0f, -0.5f, 0.0f))).toDF("id", "v")
    val got2 = df2.select(Similarity.randomProjection(col("v"), 4, 7L).as("y"))
      .collect()(0).getSeq[Long](0)
    assert(got2 == exp.map(_ * 2))
  }

  test("mrrK: first relevant rank, truncating reciprocal, zero on miss") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val results = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),   // hit at rank 2
      (2L, 20L, 1), (2L, 21L, 2),                 // hit at rank 1
      (3L, 30L, 1), (3L, 31L, 2)                  // no hits
    ).toDF("query_id", "neighbor_id", "rank")
    val truth = Seq((1L, 11L), (1L, 12L), (2L, 20L), (3L, 99L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.mrrK(results, truth, 3)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1L else r.getLong(1)), r.getLong(2))).toMap
    assert(got(1L) == ((2L, 500000L)))
    assert(got(2L) == ((1L, 1000000L)))
    assert(got(3L) == ((-1L, 0L)))
    // rank 3 truncates: 1e6 div 3 = 333333
    val r3 = Similarity.mrrK(
      Seq((9L, 1L, 1), (9L, 2L, 2), (9L, 3L, 3)).toDF("query_id", "neighbor_id", "rank"),
      Seq((9L, 3L)).toDF("query_id", "neighbor_id"), 3).collect()(0)
    assert(r3.getLong(1) == 3L && r3.getLong(2) == 333333L)
  }

  test("rboTopK: identical = sum 2^-d, swap discounts the top, disjoint = 0") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3),
      (3L, 30L, 1), (3L, 31L, 2), (3L, 32L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    // q1: identical; q2: top two swapped; q3: disjoint
    val b = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 21L, 1), (2L, 20L, 2), (2L, 22L, 3),
      (3L, 90L, 1), (3L, 91L, 2), (3L, 92L, 3))
      .toDF("query_id", "neighbor_id", "rank")
    val got = Similarity.rboTopK(a, b, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // identical: X_d = d -> 1e6/2 + 1e6/4 + 1e6/8 = 875000
    assert(got(1L) == ((3L, 875000L)))
    // swap: X_1 = 0, X_2 = 2, X_3 = 3 -> 0 + 250000 + 125000 = 375000
    assert(got(2L) == ((3L, 375000L)))
    assert(got(3L) == ((0L, 0L)))
  }

  test("EmbeddingDrift.centroidCosine is the exact sum-vector cosine per label pair") {
    import spark.implicits._
    // label 0: (1,0)+(1,0) -> sum (2,0); label 1: (0,3); label 2: (4,0)
    // cos(0,1)=0, cos(0,2)=1, cos(1,2)=0; zero-sum label 3 -> NULL
    val df = Seq(
      (0, Seq(1L, 0L)), (0, Seq(1L, 0L)),
      (1, Seq(0L, 3L)),
      (2, Seq(4L, 0L)),
      (3, Seq(0L, 0L))).toDF("label", "v")
    val out = graft.pipeline.EmbeddingDrift.centroidCosine(df, "label", "v")
      .orderBy("label_a", "label_b").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out((0, 1)) == ((2L, 1L, 0L)))
    assert(out((0, 2)) == ((2L, 1L, 1000000L)))
    assert(out((1, 2))._3 == 0L)
    assert(out((0, 3))._3 == -1L && out((1, 3))._3 == -1L) // NULL cosine
  }
}
