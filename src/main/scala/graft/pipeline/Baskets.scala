package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Market-basket co-occurrence mining: frequent item PAIRS with
 * support, confidence and an integer-permille lift — the association-
 * rule primitive (recommendations, query-expansion tables, co-purchase
 * audits) at the 2-itemset level where the relational shape stays
 * linear-ish.
 *
 * Scale shape: baskets dedupe to distinct (basket, item) rows first;
 * the pair expansion is a SELF-EQUI-join on the basket id (ordered
 * `item_a < item_b`, so each unordered pair appears exactly once) —
 * quadratic only in the per-basket item count, which real baskets
 * bound at tens, never in the corpus. One groupBy on the pair,
 * per-item counts broadcast-join back. `minSupport` prunes the long
 * tail before any per-item join. All counts exact longs; confidence
 * and lift are integer permille (a·1000 div b), bit-reproducible.
 */
object Baskets {
  /** (item_a, item_b, support, conf_ab_permille, lift_permille):
    * `conf_ab = support(ab)/support(a)`,
    * `lift = support(ab)·N / (support(a)·support(b))`, both ×1000. */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    // items has four consumers (basket total, item counts, both pair
    // sides) but is NOT materialized: the r20 A/B measured an eager
    // checkpoint at +0.5 s on q_assoc — `items` ends in the distinct's
    // exchange, which AQE's runtime stage reuse already shares across
    // all four consumers, so the checkpoint only added a job.
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i")).distinct()
    val nBaskets = items.select("__b").distinct()
      .agg(count(lit(1)).as("__n"))
    val itemCounts = items.groupBy(col("__i").as("__ic")).agg(count(lit(1)).as("__c"))
    val a = items.select(col("__b"), col("__i").as("item_a"))
    val b = items.select(col("__b"), col("__i").as("item_b"))
    val pairs = a.join(b, Seq("__b")).where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
      .where(col("support") >= minSupport)
    pairs
      .join(itemCounts.withColumnRenamed("__c", "__ca"),
        col("item_a") === col("__ic")).drop("__ic")
      .join(itemCounts.withColumnRenamed("__c", "__cb"),
        col("item_b") === col("__ic")).drop("__ic")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("support"),
        expr("support * 1000 div __ca").as("conf_ab_permille"),
        expr("support * __n * 1000 div (__ca * __cb)").as("lift_permille"))
  }
}
