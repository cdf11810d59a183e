package graft.tools

import graft.Raster
import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Isolated micro-benchmark probe: reruns ONE of Bench's micro shapes in
 * a fresh JVM, printing every rep, so a drifting in-session micro
 * number (measured after 280 queries' worth of heap history) can be
 * separated from a genuine plan/kernel regression. Born from the r15
 * verdict's micro_assemble_100x256 creep investigation (0.66x -> 0.85x
 * -> 0.97x of BASELINE.md across rounds with the assembler code
 * untouched) — see README "Performance" for the recorded findings.
 *
 * Usage: java -cp "target/scala-2.13/classes:SPARK_JARS" (the spark
 * jars glob) graft.tools.MicroProbe [assemble|explode|agg_stats] [reps]
 */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val shape = args.headOption.getOrElse("assemble")
    val reps = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Raster.init(spark)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    val run: () => Unit = shape match {
      case "assemble" =>
        val cellsDf = spark.range(100)
          .select(col("id"), rf_synthetic_tile(col("id"), 256, 256, "int8").as("t"))
          .select(col("id"), rf_explode_tiles(col("t")))
          .repartition(4, col("id"))
          .persist()
        cellsDf.count()
        () => {
          cellsDf.groupBy("id")
            .agg(rf_assemble_tile(col("column_index"), col("row_index"), col("t"),
              256, 256, "int8"))
            .count(); ()
        }
      case "assemble_scan" =>
        // the assemble micro's input side alone: persisted exploded
        // cells -> noop sink. Separates cache-scan cost from the
        // ObjectHashAggregate + TileAssembler cost.
        val cellsDf = spark.range(100)
          .select(col("id"), rf_synthetic_tile(col("id"), 256, 256, "int8").as("t"))
          .select(col("id"), rf_explode_tiles(col("t")))
          .repartition(4, col("id"))
          .persist()
        cellsDf.count()
        () => cellsDf.write.mode("overwrite").format("noop").save()
      case "assemble_groupcount" =>
        // same scan + the same-key ObjectHashAggregate shape but a
        // trivial count agg: isolates the TileAssembler update cost.
        val cellsDf = spark.range(100)
          .select(col("id"), rf_synthetic_tile(col("id"), 256, 256, "int8").as("t"))
          .select(col("id"), rf_explode_tiles(col("t")))
          .repartition(4, col("id"))
          .persist()
        cellsDf.count()
        () => { cellsDf.groupBy("id").agg(sum("t")).count(); () }
      case "explode" =>
        val tiles = spark.range(100).repartition(10)
          .select(rf_synthetic_tile(col("id"), 256, 256, "uint8").as("t")).persist()
        tiles.count()
        () => tiles.select(rf_explode_tiles(col("t")))
          .write.mode("overwrite").format("noop").save()
      case "agg_stats" =>
        val tiles = spark.range(400).repartition(32)
          .select(rf_synthetic_tile(col("id"), 240, 240, "uint16ud255").as("t")).persist()
        tiles.count()
        () => { tiles.select(rf_agg_stats(col("t"))).collect(); () }
      case other => sys.error(s"unknown shape: $other")
    }

    run() // warmup
    val times = (1 to reps).map { i =>
      val s = time(run())
      println(f"[probe] $shape rep $i%2d: ${s * 1000}%8.1f ms")
      s
    }
    val sorted = times.sorted
    println(f"[probe] $shape best=${sorted.head * 1000}%.1f ms " +
      f"median=${sorted(reps / 2) * 1000}%.1f ms worst=${sorted.last * 1000}%.1f ms")
    spark.stop()
  }
}
