package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Testdata schema-drift tripwire: every SparkEntry query must ANALYZE
 * (plan-build only, no execution) against the CURRENT testdata. The
 * round-9 incident this guards against: the driver regenerated
 * events.parquet with `ts` as TIMESTAMP(MICROS) instead of
 * TIMESTAMP(NANOS)-as-long, and five temporal queries failed analysis
 * for the first time inside the driver's bench run, as five opaque
 * DATATYPE_MISMATCH errors. This spec turns that class of external
 * change into one named assertion listing every broken query AND the
 * current table schemas, so the drift is diagnosable from the failure
 * message alone.
 */
class EntrySchemaSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("every SparkEntry query analyzes against the current testdata") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.analyzed; None }
        catch {
          case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("")
              .linesIterator.take(3).mkString(" | "))
        }
    }
    lazy val schemas = Seq("events", "documents", "embeddings", "lineitem",
        "orders", "customer")
      .map(t => s"$t: " +
        spark.read.parquet(s"$sfDir/$t.parquet").schema.simpleString)
      .mkString("\n  ")
    assert(failures.isEmpty,
      s"""${failures.size} queries no longer analyze against $sfDir —
         |likely a driver testdata regeneration changed a table schema.
         |Current schemas:
         |  $schemas
         |Failures:
         |  ${failures.mkString("\n  ")}""".stripMargin)
  }

  test("eventsMicros absorbs both known shapes of events.ts") {
    // the helper must yield identical epoch micros whether ts arrives
    // as a typed TIMESTAMP (current testdata) or as long nanos (the
    // legacy nanosAsLong read) — simulated here by rewriting a copy
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "ts").limit(200)
    val dir = java.nio.file.Files.createTempDirectory("graft_evdrift").toString
    // long-nanos twin of the same rows
    ev.select(col("event_id"), (unix_micros(col("ts").cast("timestamp")) * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val typed = ev
      .withColumn("tus", graft.pipeline.Temporal.epochMicros(ev, "ts"))
      .select("event_id", "tus")
    val nanos = spark.read.parquet(s"$dir/events.parquet")
    val lifted = nanos.withColumn("tus", expr("ts div 1000"))
      .select("event_id", "tus")
    val diff = typed.except(lifted).count() + lifted.except(typed).count()
    assert(diff == 0L, s"typed vs nanos epoch micros diverged on $diff rows")
  }
}
