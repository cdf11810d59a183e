package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: does repartition(col) + localCheckpoint(true) preserve
  * HashPartitioning through the checkpoint (so later joins on that key
  * skip the exchange), with and without AQE? */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e0 = (0L until 100000L).map(i => (i % 1000, i)).toDF("b", "x")
      .repartition(col("b")).sortWithinPartitions("b")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val e = try e0.localCheckpoint(true)
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    println("=== checkpointed plan partitioning:")
    println(e.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        (r.outputPartitioning, r.outputOrdering).toString
    }.getOrElse("no LogicalRDD"))
    val labels = (0L until 1000L).map(i => (i, i * 2)).toDF("node", "lbl")
    val j = e.join(labels.withColumnRenamed("node", "b"), "b")
    j.write.mode("overwrite").format("noop").save()
    println("=== join plan (look for Exchange above ExistingRDD):")
    println(j.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
