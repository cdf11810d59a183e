package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics for corpus curation: the web-crawl side of a
 * training-data pipeline ranks domains/pages by link structure
 * (Common Crawl publishes exactly such host- and domain-level ranks)
 * and feeds the rank into quality gating.
 *
 * [[pageRank]] is a power iteration written as plain joins and
 * aggregations — the Pregel-lite shape relational engines execute well:
 * per iteration, each edge sends `rank(src)/outdeg(src)` to its
 * destination (a shuffle on `dst` with map-side combine), and every
 * node folds damping. Edges partition by key; a hot destination is a
 * groupBy hot key (AQE-splittable), never a cross product. The loop
 * `localCheckpoint`s each iteration so plans don't nest (the
 * [[Dedup]] connected-components recipe).
 *
 * DETERMINISM: ranks are FIXED-POINT longs in millionths (`SCALE`),
 * not doubles — floating summation order across partitions would make
 * every run (and every engine) disagree in late digits, while integer
 * sums are associative, so the result is bit-reproducible and the
 * DuckDB oracle (q_pagerank) replays it exactly with `//` division.
 * Contributions use floor division (`rank div outdeg`), so up to
 * `outdeg-1` millionths per node-iteration are truncated rather than
 * redistributed — a sub-ppm bias, irrelevant for ranking.
 *
 * Simple variant: dangling nodes (no out-edges) leak their mass
 * instead of redistributing it — ranks still order correctly; add a
 * dangling-sum broadcast term if the exact eigenvector matters.
 */
object Graph {
  /** Fixed-point scale: ranks are longs in millionths. */
  val Scale = 1000000L

  /**
   * `iterations` rounds of damped power iteration over `edges`
   * (`srcCol`, `dstCol`; parallel edges count once — deduped).
   * `dampingPermille` is the damping factor in permille (850 = the
   * classic 0.85). Returns (node, rank) with rank in millionths of the
   * uniform start mass.
   */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampingPermille: Int = 850): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      s"dampingPermille must be in [0, 1000], got $dampingPermille")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val base = (1000L - dampingPermille) * Scale
    var ranks = nodes.withColumn("rank", lit(Scale))
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          expr("rank div outdeg").as("contrib"))
        .groupBy("node").agg(sum("contrib").as("in_mass"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr(s"(${base}L + $dampingPermille * coalesce(in_mass, 0L)) div 1000")
            .as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
