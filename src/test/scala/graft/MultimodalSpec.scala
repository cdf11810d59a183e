package graft

import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real-image codec coverage: PNG encode → decode round-trips exactly;
  * JPEG and GIF payloads decode (JDK ImageIO readers); non-image bytes
  * come back null instead of erroring. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def pngOf(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("mm_encode_png -> mm_decode_image round-trips dims, channels and pixels") {
    val df = Seq((5, 3), (1, 1), (13, 11)).toDF("w", "h")
      .select(col("w"), col("h"),
        Multimodal.encode_png(
          transform(sequence(lit(0), col("w") * col("h") - 1),
            i => (pmod(i * 37 + 11, lit(256)) * 65536 + pmod(i * 5, lit(256)) * 256 +
              pmod(i, lit(256))).cast("int")),
          col("w"), col("h")).as("blob"))
    val out = df.select(col("w"), col("h"),
      Multimodal.decode_image(col("blob")).as("img"),
      Multimodal.image_pixel(col("blob"), lit(0), lit(0)).as("p00"),
      Multimodal.image_pixel(col("blob"), col("w") - 1, col("h") - 1).as("pll"))
      .collect()
    for (r <- out) {
      val (w, h) = (r.getInt(0), r.getInt(1))
      val img = r.getStruct(2)
      assert((img.getInt(0), img.getInt(1), img.getInt(2)) == (w, h, 3))
      assert(r.getInt(3) == (11 % 256) * 65536 + 0 * 256 + 0)
      val last = w * h - 1
      assert(r.getInt(4) ==
        ((last * 37 + 11) % 256) * 65536 + ((last * 5) % 256) * 256 + (last % 256))
    }
  }

  test("mm_image_resize picks exact floor-mapped source pixels") {
    // 4x2 source with pixel value = linear index; resize to 2x4:
    // out(x,y) = src(x*4/2, y*2/4) = index (y/2)*4 + 2x
    val df = Seq(1).toDF("one").select(
      Multimodal.encode_png(
        transform(sequence(lit(0), lit(7)), i => i.cast("int")), lit(4), lit(2)).as("blob"))
    val resized = df.select(Multimodal.image_resize(col("blob"), lit(2), lit(4)).as("r"))
    val out = resized.select(
      Multimodal.decode_image(col("r")).as("img"),
      Multimodal.image_pixel(col("r"), lit(0), lit(0)).as("p00"),
      Multimodal.image_pixel(col("r"), lit(1), lit(0)).as("p10"),
      Multimodal.image_pixel(col("r"), lit(0), lit(3)).as("p03"),
      Multimodal.image_pixel(col("r"), lit(1), lit(3)).as("p13")).head()
    val img = out.getStruct(0)
    assert((img.getInt(0), img.getInt(1)) == (2, 4))
    assert(out.getInt(1) == 0)
    assert(out.getInt(2) == 2)
    assert(out.getInt(3) == 4) // y=3 -> sy = 3*2/4 = 1 -> index 4 + 2x
    assert(out.getInt(4) == 6)
    // non-image payload resizes to null
    val n = Seq("nope").toDF("s")
      .select(Multimodal.image_resize(Multimodal.to_blob(col("s")), lit(2), lit(2)).as("r"))
      .head()
    assert(n.isNullAt(0))
  }

  test("PngCodec fast path matches ImageIO bit-for-bit on filtered PNGs") {
    // ImageIO's PNG writer picks adaptive per-row filters (Sub/Up/
    // Average/Paeth on real content), so decoding its output exercises
    // every reconstruction branch of the native fast path.
    val shapes = Seq((1, 1), (7, 3), (64, 64), (33, 17))
    for ((w, h) <- shapes) {
      val png = pngOf(w, h, (x, y) => ((x * 31 + y * 7) % 256) * 65536 +
        ((x * x + y) % 256) * 256 + ((x + y * y) % 256))
      val fast = graft.pipeline.PngCodec.decode(png)
      assert(fast != null, s"fast path rejected ImageIO PNG ${w}x$h")
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(fast.getWidth == ref.getWidth && fast.getHeight == ref.getHeight)
      for (y <- 0 until h; x <- 0 until w)
        assert(fast.getRGB(x, y) == ref.getRGB(x, y), s"pixel ($x,$y) of ${w}x$h")
    }
    // gray PNG: 1 channel, same bytes either way
    val gimg = new java.awt.image.BufferedImage(9, 5, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 5; x <- 0 until 9) gimg.getRaster.setSample(x, y, 0, (x * 29 + y * 13) % 256)
    val gos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gimg, "png", gos)
    val gfast = graft.pipeline.PngCodec.decode(gos.toByteArray)
    assert(gfast != null && gfast.getColorModel.getNumComponents == 1)
    for (y <- 0 until 5; x <- 0 until 9)
      assert(gfast.getRGB(x, y) == gimg.getRGB(x, y))
    // non-PNG and exotic PNG shapes fall through to null (→ ImageIO)
    assert(graft.pipeline.PngCodec.decode("notapng".getBytes) == null)
  }

  test("PngCodec rejects hostile headers and tRNS without crashing") {
    def crc(bytes: Array[Byte], off: Int, len: Int): Int = {
      val c = new java.util.zip.CRC32(); c.update(bytes, off, len); c.getValue.toInt
    }
    def i32(v: Int): Array[Byte] =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def header(w: Int, h: Int, colorType: Int): Array[Byte] = {
      val os = new java.io.ByteArrayOutputStream()
      os.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      val ihdr = Array[Byte]('I', 'H', 'D', 'R') ++ i32(w) ++ i32(h) ++
        Array[Byte](8, colorType.toByte, 0, 0, 0)
      os.write(i32(13)); os.write(ihdr); os.write(i32(crc(ihdr, 0, ihdr.length)))
      os.toByteArray
    }
    // 1 x 536_870_911 RGBA: stride*h overflows Int (~2.68e9) — must return
    // null, not throw NegativeArraySizeException (the r5 ADVICE case).
    val bomb = header(1, 536870911, 6) ++ i32(0) ++
      Array[Byte]('I', 'E', 'N', 'D') ++ i32(0)
    assert(graft.pipeline.PngCodec.decode(bomb) == null)
    // 46_000 x 46_000 gray: stride*h fits in Int but exceeds the 256 MiB
    // allocation cap — null, not a 2 GB allocation from a 50-byte input.
    val big = header(46000, 46000, 0) ++ i32(0) ++
      Array[Byte]('I', 'E', 'N', 'D') ++ i32(0)
    assert(graft.pipeline.PngCodec.decode(big) == null)
    // gray PNG with a tRNS chunk: fast path must defer to ImageIO (which
    // honors the transparency) instead of decoding as opaque gray.
    val os = new java.io.ByteArrayOutputStream()
    os.write(header(2, 2, 0))
    val trns = Array[Byte]('t', 'R', 'N', 'S', 0, 0)
    os.write(i32(2)); os.write(trns); os.write(i32(crc(trns, 0, trns.length)))
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(Array[Byte](0, 10, 20, 0, 30, 40)) // 2 rows: filter 0 + 2 px
      d.finish()
      val buf = new Array[Byte](64); val n = d.deflate(buf); d.end(); buf.take(n)
    }
    val idat = Array[Byte]('I', 'D', 'A', 'T') ++ deflated
    os.write(i32(deflated.length)); os.write(idat); os.write(i32(crc(idat, 0, idat.length)))
    val iend = Array[Byte]('I', 'E', 'N', 'D')
    os.write(i32(0)); os.write(iend); os.write(i32(crc(iend, 0, 4)))
    assert(graft.pipeline.PngCodec.decode(os.toByteArray) == null)
  }

  test("mm_decode_image reads JPEG and GIF payloads, not just PNG") {
    def enc(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(17, 9, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(("jpeg", enc("jpeg")), ("gif", enc("gif"))).toDF("fmt", "blob")
      .select(col("fmt"), Multimodal.decode_image(col("blob")).as("img"))
      .collect()
    for (r <- rows) {
      val img = r.getStruct(1)
      assert((img.getInt(0), img.getInt(1)) == (17, 9), r.getString(0))
    }
  }

  test("non-image payloads decode to null; pixel probes null out of bounds") {
    val png = pngOf(4, 2, (x, y) => x * 16 + y)
    val rows = Seq(("garbage", "not an image at all".getBytes("UTF-8")), ("png", png))
      .toDF("kind", "blob")
      .select(col("kind"),
        Multimodal.decode_image(col("blob")).as("img"),
        Multimodal.image_pixel(col("blob"), lit(99), lit(0)).as("oob"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("garbage").isNullAt(1))
    assert(rows("garbage").isNullAt(2))
    assert(!rows("png").isNullAt(1))
    assert(rows("png").isNullAt(2), "out-of-bounds pixel must be null")
  }

  test("SQL surface: decode/pixel/stub names registered and consistent") {
    val r = spark.sql(
      """SELECT mm_decode_image(b).width AS w, mm_decode_image(b).height AS h,
        |       mm_image_pixel(b, 1, 0) AS p,
        |       mm_decode_image_stub(b).channels AS sc
        |FROM (SELECT mm_encode_png(array(255, 65280, 16711680, 0, 128, 32896), 3, 2) AS b)
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) == 3 && r.getInt(1) == 2)
    assert(r.getInt(2) == 65280)
    assert(r.getInt(3) == 3)
  }

  test("mm_wav_stats parses the synth fixture and tolerates extra chunks") {
    val rows = Seq((5L, 8), (0L, 0)).toDF("seed", "n")
      .select(col("seed"),
        Multimodal.wav_stats(Multimodal.wav_synth(col("seed"), col("n"))).as("st"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val st = rows(5L)
    assert(st.getInt(0) == 16000 && st.getInt(1) == 1 && st.getLong(2) == 8L)
    // closed form: ((5*31 + i*7) % 65536) - 32768 for i in [0, 8)
    val want = (0 until 8).map(i => ((5 * 31 + i * 7) % 65536) - 32768)
    assert(st.getInt(3) == want.min && st.getInt(4) == want.max &&
      st.getLong(5) == want.map(_.toLong).sum)
    assert(rows(0L).getLong(2) == 0L, "zero-sample payload parses (n=0)")

    // hand-build a payload with a LIST chunk between fmt and data
    val base = Seq((7L, 4)).toDF("seed", "n")
      .select(Multimodal.wav_synth(col("seed"), col("n"))).collect()(0).getAs[Array[Byte]](0)
    val fmtAndOn = java.util.Arrays.copyOfRange(base, 12, base.length)
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withList = java.util.Arrays.copyOfRange(base, 0, 12) ++
      java.util.Arrays.copyOfRange(fmtAndOn, 0, 24) ++ list ++
      java.util.Arrays.copyOfRange(fmtAndOn, 24, fmtAndOn.length)
    val bb = java.nio.ByteBuffer.wrap(withList).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, withList.length - 8) // fix RIFF size for the inserted chunk
    val parsed = Seq(Tuple1(withList)).toDF("b")
      .select(Multimodal.wav_stats(col("b"))).collect()(0)
    assert(!parsed.isNullAt(0), "LIST chunk must be tolerated")
    assert(parsed.getStruct(0).getLong(2) == 4L)
  }

  test("mm_wav_stats nulls out malformed and non-PCM payloads") {
    val wav = Seq((1L, 4)).toDF("seed", "n")
      .select(Multimodal.wav_synth(col("seed"), col("n"))).collect()(0).getAs[Array[Byte]](0)
    val truncated = java.util.Arrays.copyOfRange(wav, 0, wav.length - 3)
    val notRiff = "definitely not audio bytes".getBytes("UTF-8")
    val badFmt = wav.clone(); badFmt(20) = 3 // audioFormat = 3 (float)
    val out = Seq(("trunc", truncated), ("plain", notRiff), ("float", badFmt))
      .toDF("kind", "b")
      .select(col("kind"), Multimodal.wav_stats(col("b")).as("st"))
      .collect().map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(out == Map("trunc" -> true, "plain" -> true, "float" -> true))
  }

  test("SQL surface: mm_wav_synth/mm_wav_stats registered") {
    val r = spark.sql(
      "SELECT mm_wav_stats(mm_wav_synth(9, 16)).n_samples AS n").collect()(0)
    assert(r.getLong(0) == 16L)
  }

  test("mm_image_ahash: flat image hashes to 0, half-bright sets the right half") {
    // 1x1 flat: every cell equals the mean -> no bit strictly above it
    val flat = spark.sql(
      "SELECT mm_image_ahash(mm_encode_png(array(8224125), 1, 1)) AS h")
      .head().getLong(0)
    assert(flat == 0L)
    // 2x1 black|white: columns 0-3 sample pixel 0 (gray 0), 4-7 pixel 1
    // (gray 255); mean = 127 -> exactly the 32 right-half bits set
    val half = spark.sql(
      "SELECT mm_image_ahash(mm_encode_png(array(0, 16777215), 2, 1)) AS h")
      .head().getLong(0)
    assert(java.lang.Long.bitCount(half) == 32)
    for (y <- 0 until 8; x <- 0 until 8) {
      val bit = (half >> (y * 8 + x)) & 1L
      assert(bit == (if (x >= 4) 1L else 0L), s"bit ($x,$y)")
    }
    // near-dup robustness: one-pixel noise on a 16x16 gradient moves the
    // hash by a small Hamming step, not a rewrite
    val base = (0 until 256).map(i => (i % 16) * 16 * 65793)
    def png(p: Seq[Int]) = s"mm_encode_png(array(${p.mkString(",")}), 16, 16)"
    val noisy = base.updated(0, base(0) + 65793 * 8)
    val Array(h1, h2) = spark.sql(
      s"SELECT mm_image_ahash(${png(base)}) AS a, mm_image_ahash(${png(noisy)}) AS b")
      .head() match { case r => Array(r.getLong(0), r.getLong(1)) }
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 2, s"noise moved too many bits")
    // null passthrough on non-image bytes
    assert(spark.sql("SELECT mm_image_ahash(cast('nope' as binary)) IS NULL AS n")
      .head().getBoolean(0))
  }

  test("mm_wav_energy: window sums, last partial window, null on junk") {
    // 6 samples, window 4 -> [sum of first 4 squares, last 2]
    val en = spark.sql(
      "SELECT mm_wav_energy(mm_wav_synth(3, 6), 4) AS e").head().getSeq[Long](0)
    val samples = (0 until 6).map(i => ((3L * 31 + i * 7) % 65536) - 32768)
    assert(en == Seq(samples.take(4).map(s => s * s).sum,
      samples.drop(4).map(s => s * s).sum))
    // whole-file window: one entry equal to the total energy
    val one = spark.sql(
      "SELECT mm_wav_energy(mm_wav_synth(3, 6), 100) AS e").head().getSeq[Long](0)
    assert(one == Seq(samples.map(s => s * s).sum))
    assert(spark.sql("SELECT mm_wav_energy(cast('junk' as binary), 4) IS NULL AS n")
      .head().getBoolean(0))
  }

  test("mm_frame_deltas: adjacent-histogram L1, short payloads empty") {
    // frames of 4 at stride 4 over 12 bytes: "aaaa" vs "aaab" vs "zzzz"
    // bins of width 16: 'a'=97 -> bin 6, 'b'=98 -> bin 6, 'z'=122 -> bin 7
    // f0={6:4}, f1={6:4} -> delta 0; f1 vs f2={7:4} -> delta 8
    val got = spark.sql(
      "SELECT mm_frame_deltas(encode('aaaaaaabzzzz', 'UTF-8'), 4, 4, 16) AS d")
      .head().getSeq[Long](0)
    assert(got == Seq(0L, 8L), got.toString)
    // under two frames -> empty array, never null
    val short = spark.sql(
      "SELECT mm_frame_deltas(encode('abc', 'UTF-8'), 4, 4, 16) AS d")
      .head().getSeq[Long](0)
    assert(short.isEmpty)
    // overlapping stride: 8 bytes, frame 4, stride 2 -> 3 frames, 2 deltas
    val ov = spark.sql(
      "SELECT mm_frame_deltas(encode('aaaazzzz', 'UTF-8'), 4, 2, 16) AS d")
      .head().getSeq[Long](0)
    // f0=aaaa {6:4}, f1=aazz {6:2,7:2}, f2=zzzz {7:4}
    assert(ov == Seq(4L, 4L), ov.toString)
  }
}
