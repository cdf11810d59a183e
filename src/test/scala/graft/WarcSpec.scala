package graft

import java.io.ByteArrayOutputStream
import java.util.zip.GZIPOutputStream

import graft.datasource.Warc
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def record(uri: String, payload: Array[Byte],
      extra: Map[String, String] = Map.empty): Array[Byte] = {
    val hdrs = Map("WARC-Type" -> "response", "WARC-Target-URI" -> uri,
      "Content-Length" -> payload.length.toString) ++ extra
    (s"WARC/1.0\r\n" + hdrs.map { case (k, v) => s"$k: $v\r\n" }.mkString + "\r\n")
      .getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("payload containing the record delimiter parses by Content-Length") {
    // a payload that embeds "WARC/1.0\r\n" — pattern-splitting would
    // shear it; length-framed parsing must not
    val evil = "before\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nafter".getBytes("UTF-8")
    val rows = Warc.parse(record("http://a", evil) ++ record("http://b", "x".getBytes), gzipped = false).toList
    assert(rows.map(_.getString(1)) == List("http://a", "http://b"))
    assert(rows.head.getAs[Array[Byte]](6).toSeq == evil.toSeq)
  }

  test("per-record gzip members concatenate into one stream") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); val g = new GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    // Common Crawl convention: each record its own gzip member, members
    // concatenated — the inflate loop must read past the first member
    val bytes = gz(record("http://a", "one".getBytes)) ++ gz(record("http://b", "two".getBytes))
    val rows = Warc.parse(bytes, gzipped = true).toList
    assert(rows.map(r => new String(r.getAs[Array[Byte]](6), "UTF-8")) == List("one", "two"))
  }

  test("truncated payload and missing Content-Length fail loudly") {
    val good = record("http://a", "hello".getBytes)
    val truncated = good.dropRight(6) // cuts into the payload
    assertThrows[IllegalArgumentException](Warc.parse(truncated, gzipped = false).toList)
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\n").getBytes("UTF-8")
    assertThrows[IllegalArgumentException](Warc.parse(noLen, gzipped = false).toList)
  }

  test("header names are case-insensitive, values trimmed") {
    val bytes = ("WARC/1.0\r\n" +
      "warc-type:   metadata\r\n" +
      "CONTENT-LENGTH: 2\r\n\r\n").getBytes("UTF-8") ++ "ab\r\n\r\n".getBytes("UTF-8")
    val r = Warc.parse(bytes, gzipped = false).toList.head
    assert(r.getString(0) == "metadata" && r.getLong(5) == 2L)
  }
}
