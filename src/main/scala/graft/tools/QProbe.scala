package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object QProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def tm(n: String)(b: => Unit): Unit = {
      b
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); b; (System.nanoTime() - t0) / 1e9 }
      println(f"[qp] $n: ${ts.sorted.apply(1)}%.3f s")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val qs = if (args.length > 0) args(0).split(",").toSeq
      else Seq("q_math", "q_masking2", "q_rgb_composite", "q_quantize", "q_pii", "q_image_resize")
    for (q <- qs) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      tm(s"$q declared")(df.write.mode("overwrite").format("noop").save())
      df.queryExecution.logical match {
        case s: org.apache.spark.sql.catalyst.plans.logical.Sort =>
          val keys = s.order.map(o => graft.expressions.asColumn(o.child))
          val child = org.apache.spark.sql.graft.shims.ofRows(spark, s.child)
          tm(s"$q repart+orderBy")(child.repartition(keys: _*).orderBy(keys: _*)
            .write.mode("overwrite").format("noop").save())
          // checkpoint variant — the only sampler-dedup option when the
          // sort key equals the child's existing partitioning key (the
          // repartition collapses to a plan no-op there)
          val pure = s.child match {
            case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
              org.apache.spark.sql.graft.shims.ofRows(spark, r.child)
            case _ => child
          }
          tm(s"$q ckpt+orderBy")(pure.localCheckpoint(false).orderBy(keys: _*)
            .write.mode("overwrite").format("noop").save())
        case _ => ()
      }
    }
    spark.stop()
  }
}
