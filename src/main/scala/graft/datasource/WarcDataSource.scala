package graft.datasource

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types._

/**
 * WARC (Web ARChive, ISO 28500 — the Common Crawl container) reader:
 * `spark.read.format("warc").load(dir)` → one row per WARC record with
 * the standard headers lifted to columns and the payload as an opaque
 * binary column — the text-corpus twin of the multimodal binary-column
 * convention (decode/extract stays a downstream select).
 *
 * Parsing honors Content-Length, never delimiter text: payloads are
 * arbitrary bytes and may contain "WARC/1.0", so records CANNOT be
 * split by pattern — each file is parsed sequentially. That matches the
 * industry execution shape (a crawl is thousands of ~1 GB .warc.gz
 * files; gzip is not splittable, so one task per file IS the at-scale
 * plan, parallelism = file count). `.gz` members are inflated
 * transparently (both per-record-gzipped and whole-file-gzipped WARCs
 * concatenate as valid gzip streams).
 *
 * No reference counterpart — beyond-reference ingestion surface for the
 * LLM-data pipeline operators (dedup / language-ID / quality run
 * directly over `payload`).
 */
object Warc {
  val schema: StructType = StructType(Seq(
    StructField("record_type", StringType),
    StructField("target_uri", StringType),
    StructField("warc_date", StringType),
    StructField("record_id", StringType),
    StructField("content_type", StringType),
    StructField("content_length", LongType),
    StructField("payload", BinaryType)))

  private val Version = "WARC/1.0"

  /** Parse all records of one (possibly gzipped) WARC file. */
  def parse(bytes: Array[Byte], gzipped: Boolean): Iterator[Row] = {
    val data = if (gzipped) gunzip(bytes) else bytes
    new Iterator[Row] {
      private var pos = 0
      private def skipBlankLines(): Unit =
        while (pos + 1 < data.length && data(pos) == '\r' && data(pos + 1) == '\n') pos += 2
      skipBlankLines()
      override def hasNext: Boolean = pos < data.length
      override def next(): Row = {
        val line = readLine()
        require(line == Version, s"expected $Version record header at byte $pos, got '$line'")
        var headers = Map.empty[String, String]
        var h = readLine()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          require(i > 0, s"malformed WARC header line: '$h'")
          headers += h.substring(0, i).trim.toLowerCase -> h.substring(i + 1).trim
          h = readLine()
        }
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException("WARC record missing Content-Length")).toLong
        require(pos + len <= data.length, s"truncated WARC payload at byte $pos")
        val payload = java.util.Arrays.copyOfRange(data, pos, pos + len.toInt)
        pos += len.toInt
        skipBlankLines()
        Row(headers.getOrElse("warc-type", null),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("warc-date", null),
          headers.getOrElse("warc-record-id", null),
          headers.getOrElse("content-type", null),
          len, payload)
      }
      private def readLine(): String = {
        val start = pos
        while (pos + 1 < data.length && !(data(pos) == '\r' && data(pos + 1) == '\n')) pos += 1
        val s = new String(data, start, pos - start, "UTF-8")
        pos = math.min(pos + 2, data.length)
        s
      }
    }
  }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    // java.util.zip stops at the first gzip member; WARC gz files are
    // member-per-record concatenations, so inflate in a loop
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val bis = new ByteArrayInputStream(bytes)
    while (bis.available() > 0) {
      val gz = new GZIPInputStream(bis)
      val buf = new Array[Byte](65536)
      var n = gz.read(buf)
      while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = gz.read(buf) }
    }
    out.toByteArray
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(path)
      .select(col("path"), col("content"))
    val rows = files.rdd.flatMap { r =>
      parse(r.getAs[Array[Byte]]("content"), r.getString(0).endsWith(".gz"))
    }
    spark.createDataFrame(rows, schema)
  }
}

class WarcDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def createRelation(ctx: SQLContext, parameters: Map[String, String]): BaseRelation = {
    val df = Warc.read(ctx.sparkSession, parameters.getOrElse("path",
      throw new IllegalArgumentException("warc reader requires a 'path'")))
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = df.schema
      override def buildScan(): RDD[Row] = df.rdd
    }
  }
}
