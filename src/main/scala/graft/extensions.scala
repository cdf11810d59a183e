package graft

import graft.core.{NoData, Tile}
import graft.expressions._
import graft.udt.TileUDT
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/**
 * User-extension surface + notebook rendering helpers (reference:
 * functions/LocalFunctions.scala:121-122 `rf_local_algebra`,
 * util/DataFrameRenderers.scala:36-116 toMarkdown/toHTML).
 */

/** Lift an arbitrary binary cell function into a tile expression — the
  * user's escape hatch when no built-in local op fits. */
case class LocalAlgebra(left: Expression, right: Expression, fn: (Double, Double) => Double)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def prettyName: String = "rf_local_algebra"
  override def dataType: DataType = TileUDT.instance
  @transient private lazy val le = tileExtractor(left.dataType)
  @transient private lazy val re = tileExtractor(right.dataType)
  override def nullSafeEval(l: Any, r: Any): Any =
    tileResult(le(l).combineDouble(re(r))(fn))
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object extensions {
  def rf_local_algebra(fn: (Double, Double) => Double)(a: Column, b: Column): Column =
    asColumn(LocalAlgebra(asExpr(a), asExpr(b), fn))

  /** `spark.withGraft` — the analog of the reference's `withRasterFrames`. */
  implicit class GraftSessionMethods(val spark: org.apache.spark.sql.SparkSession) extends AnyVal {
    def withGraft: org.apache.spark.sql.SparkSession = Raster.init(spark)
  }

  implicit class GraftDataFrameMethods(val df: DataFrame) extends AnyVal {
    /** Range-partition by the `spatial_index` column (produced by the
      * raster reader's `spatial_index` option or `Layer.write`) so
      * spatially-near tiles share partitions — the role of the
      * reference's `spatial_index_partitions` reader option. Pass 0 to
      * use `spark.sql.shuffle.partitions`. */
    def withSpatialIndexPartitions(numPartitions: Int = 0): DataFrame = {
      require(df.columns.contains("spatial_index"),
        "withSpatialIndexPartitions needs a spatial_index column " +
          "(read with option(\"spatial_index\", \"true\") or use Layer.write)")
      val n = if (numPartitions > 0) numPartitions
        else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
      df.repartitionByRange(n, org.apache.spark.sql.functions.col("spatial_index"))
    }

    /** Persist as a BUCKETED + per-bucket-sorted catalog table — the
      * co-located-join primitive for repeated 100 TB joins: two tables
      * bucketed on the same key with the same bucket count equi-join
      * and aggregate with ZERO exchanges (the scan's output
      * partitioning already satisfies the join's requirement;
      * BucketingSpec asserts the exchange-free plan). Pay one write-time
      * shuffle, amortize it over every later join — the Spark-native
      * answer to "pre-partition the fact tables". `path` keeps data out
      * of the default warehouse; bucket pruning applies on point
      * predicates over the key. */
    def saveBucketedTable(table: String, keyCol: String, buckets: Int,
        path: String): Unit = {
      require(buckets > 0, s"buckets must be positive, got $buckets")
      df.write.bucketBy(buckets, keyCol).sortBy(keyCol)
        .option("path", path).mode("overwrite").saveAsTable(table)
    }

    /** Markdown table; tile cells summarized as `cellType cols×rows`.
      * `truncate` caps non-tile cells at 40 chars (the reference
      * renderer's knob, util/DataFrameRenderers.scala:36-116). */
    def toMarkdown(numRows: Int = 5, truncate: Boolean = false): String = {
      val rows = df.limit(numRows).collect()
      val header = df.columns
      def cell(v: Any): String = v match {
        case t: Tile => s"${t.cellType.name} ${t.cols}×${t.rows}"
        case null => ""
        case other =>
          val s = other.toString
          if (truncate && s.length > 40) s.take(37) + "..." else s
      }
      val sb = new StringBuilder
      sb.append(header.mkString("| ", " | ", " |\n"))
      sb.append(header.map(_ => "---").mkString("| ", " | ", " |\n"))
      rows.foreach(r => sb.append(
        header.indices.map(i => cell(r.get(i))).mkString("| ", " | ", " |\n")))
      sb.toString
    }

    /** HTML table; tile columns rendered as inline base64 PNG thumbnails. */
    def toHTML(numRows: Int = 5, truncate: Boolean = false): String = {
      import graft.functions._
      val tileCols = df.schema.fields.filter(f => isTileType(f.dataType)).map(_.name)
      val rendered = tileCols.foldLeft(df.limit(numRows)) { (d, c) =>
        d.withColumn(c, rf_render_png(org.apache.spark.sql.functions.col(c)))
      }
      val rows = rendered.collect()
      val header = df.columns
      val sb = new StringBuilder("<table><tr>")
      header.foreach(h => sb.append(s"<th>$h</th>"))
      sb.append("</tr>")
      rows.foreach { r =>
        sb.append("<tr>")
        header.indices.foreach { i =>
          val v = r.get(i)
          val cell = v match {
            case b: Array[Byte] if tileCols.contains(header(i)) =>
              val b64 = java.util.Base64.getEncoder.encodeToString(b)
              s"""<img src="data:image/png;base64,$b64"/>"""
            case null => ""
            case other =>
              val s = other.toString
              if (truncate && s.length > 40) s.take(37) + "..." else s
          }
          sb.append(s"<td>$cell</td>")
        }
        sb.append("</tr>")
      }
      sb.append("</table>")
      sb.toString
    }
  }
}

/** Static py4j bridge for the notebook helpers — the role of the
  * reference's `RFContext._dfToMarkdown` / `_dfToHTML`
  * (ref python/pyrasterframes/rf_ipython.py `spark_df_to_markdown` /
  * `spark_df_to_html` call them through the gateway): a TOP-LEVEL
  * object with plain methods because py4j can neither reach Scala
  * implicit-class extension methods nor `$`-mangled nested objects. */
object Display {
  def dfToMarkdown(df: DataFrame, numRows: Int, truncate: Boolean): String =
    new extensions.GraftDataFrameMethods(df).toMarkdown(numRows, truncate)
  def dfToHTML(df: DataFrame, numRows: Int, truncate: Boolean): String =
    new extensions.GraftDataFrameMethods(df).toHTML(numRows, truncate)
}
