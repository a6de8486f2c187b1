package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.sources.Tables

/** Multimodal column plumbing: payload/metadata schema, deterministic
  * stubbed decode over real binary batches. */
class MultimodalSpec extends AnyFunSuite with SharedSpark {

  private val sf = "/root/testdata/sf0.001"

  test("withPayload: binary payload + typed metadata struct") {
    val df = Multimodal.withPayload(Tables(spark, sf, "documents"))
    assert(df.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(df.schema("meta").dataType == Multimodal.mediaMetaType)
    val row = df.selectExpr("meta.n_bytes", "octet_length(payload)")
      .head()
    assert(row.getLong(0) == row.getInt(1).toLong)
  }

  test("sampleFrames: strided fixed-size slices reassemble the payload prefix") {
    val payloads = Multimodal.withPayload(Tables(spark, sf, "documents"))
    val framed = Multimodal.sampleFrames(payloads, frameBytes = 16,
      stride = 1)
    val row = framed.join(payloads, "doc_id")
      .selectExpr("frames", "payload", "n_frames").head()
    val frames = row.getSeq[Array[Byte]](0)
    val payload = row.getAs[Array[Byte]](1)
    assert(frames.map(_.length).sum == payload.length)
    assert(java.util.Arrays.equals(frames.flatten.toArray, payload))
    // stride 2 keeps every other frame
    val strided = Multimodal.sampleFrames(payloads, 16, 2)
      .selectExpr("n_frames").head().getInt(0)
    assert(strided == (row.getInt(2) + 1) / 2)
  }

  test("Codecs: BMP round-trips every pixel, incl. padded odd widths") {
    import graft.multimodal.Codecs
    // widths 1..9 cross every row-padding residue (stride = 4-aligned)
    for (w <- 1 to 9; h <- Seq(1, 3, 8)) {
      val px = (x: Int, y: Int) =>
        ((x * 31 + y * 7) % 256, (x + y * 101) % 256, (x * 5 + y) % 256)
      val img = Codecs.decodeBmp(Codecs.encodeBmp(w, h, px))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y)(x) == px(x, y), s"pixel ($x,$y) at ${w}x$h")
    }
  }

  test("Codecs: WAV PCM16 round-trips samples; RIFF walk skips chunks") {
    import graft.multimodal.Codecs
    val samples = Array.tabulate(777)(j => ((j * 997) % 65536) - 32768)
    val bytes = Codecs.encodeWavPcm16(44100, 2, samples)
    val audio = Codecs.decodeWavPcm16(bytes)
    assert(audio.sampleRate == 44100 && audio.channels == 2)
    assert(audio.samples.toSeq == samples.toSeq)
    // inject an unknown odd-length chunk between fmt and data — the
    // walker must skip it (word-aligned) and still find the samples
    val fmtEnd = 36 // RIFF(12) + fmt header(8) + fmt body(16)
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      1, 2, 3, 4, 5, 0) // len 5 + pad byte
    val patched = bytes.take(fmtEnd) ++ junk ++ bytes.drop(fmtEnd)
    putRiffSize(patched)
    val audio2 = Codecs.decodeWavPcm16(patched)
    assert(audio2.samples.toSeq == samples.toSeq)
  }

  private def putRiffSize(b: Array[Byte]): Unit = {
    val v = b.length - 8
    b(4) = v.toByte; b(5) = (v >>> 8).toByte
    b(6) = (v >>> 16).toByte; b(7) = (v >>> 24).toByte
  }

  test("Codecs: PNG inflate+unfilter round-trips all five filters") {
    import graft.multimodal.Codecs
    // height ≥ 5 ⇒ the encoder's filter cycle covers None..Paeth
    for ((w, h) <- Seq((1, 6), (7, 5), (16, 11), (3, 40))) {
      val px = (x: Int, y: Int) => (x * 37 + y * 113 + (x * y) % 7) % 256
      val img = Codecs.decodePng(Codecs.encodePng(w, h, px))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y)(x) == px(x, y), s"pixel ($x,$y) at ${w}x$h")
    }
  }

  test("Codecs: malformed inputs are rejected, never mis-decoded") {
    import graft.multimodal.Codecs
    val bmp = Codecs.encodeBmp(4, 4, (_, _) => (1, 2, 3))
    intercept[IllegalArgumentException](
      Codecs.decodeBmp(bmp.take(20))) // truncated header
    intercept[IllegalArgumentException](
      Codecs.decodeBmp("XX".getBytes ++ bmp.drop(2))) // bad magic
    val wav = Codecs.encodeWavPcm16(8000, 1, Array(1, -1, 2))
    intercept[IllegalArgumentException](
      Codecs.decodeWavPcm16(wav.take(30))) // data chunk overruns
    val png = Codecs.encodePng(5, 6, (x, y) => x + y)
    intercept[IllegalArgumentException](
      Codecs.decodePng(png.take(png.length - 4))) // lost IEND tail
    val corrupt = png.clone()
    corrupt(40) = (corrupt(40) ^ 0x7f).toByte // flip a byte inside IDAT
    intercept[IllegalArgumentException](Codecs.decodePng(corrupt))
    // header-controlled Int overflow: width 0x2AAAAAAB makes
    // (width*3+3)*height wrap positive under Int math — the Long-math
    // guard must reject it as validated truncation, not AIOOBE/OOM
    val evil = bmp.clone()
    evil(18) = 0xAB.toByte; evil(19) = 0xAA.toByte
    evil(20) = 0xAA.toByte; evil(21) = 0x2A.toByte
    val e = intercept[IllegalArgumentException](Codecs.decodeBmp(evil))
    assert(e.getMessage.contains("truncated"), e.getMessage)
    // the quarantine seam: validated failures become Left, successes
    // Right — the per-row routing a 100 TB corpus scrubber needs
    assert(Codecs.tryDecode(Codecs.decodeBmp(evil)).isLeft)
    assert(Codecs.tryDecode(Codecs.decodeBmp(bmp)).isRight)
    // a corrupt sample rate must be named AT the fmt field, not
    // surface later as the misleading "data chunk before fmt chunk"
    // (r20 review): zero the rate bytes inside the fmt chunk
    val badRate = wav.clone()
    badRate(24) = 0; badRate(25) = 0; badRate(26) = 0; badRate(27) = 0
    val re = intercept[IllegalArgumentException](
      Codecs.decodeWavPcm16(badRate))
    assert(re.getMessage.contains("sample rate"), re.getMessage)
    // SOF0 dimensions are 16-bit: beyond-65535 dims must be a
    // validated refusal, not a silently mod-65536 header (r20 review)
    val je = intercept[IllegalArgumentException](
      Codecs.encodeJpegGray(65537, 8, (_, _) => 0))
    assert(je.getMessage.contains("16-bit"), je.getMessage)
  }

  test("Codecs: JPEG block-constant images round-trip EXACTLY at quant 1") {
    import graft.multimodal.Codecs
    // a constant 8x8 block is DC-only: the DC coefficient 8*(v-128) is
    // an exact integer, quant 1 preserves it, and the IDCT of a pure
    // DC block is exactly flat — so block-constant images survive the
    // lossy format losslessly. This closed form is also the catalog
    // face's DuckDB oracle.
    for ((w, h) <- Seq((8, 8), (9, 10), (16, 13), (22, 17), (7, 5))) {
      val px = (x: Int, y: Int) => (37 + 11 * (x / 8) + 29 * (y / 8)) % 256
      val img = Codecs.decodeJpegGray(
        Codecs.encodeJpegGray(w, h, px, Codecs.JpegFlatQuant))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y)(x) == px(x, y), s"pixel ($x,$y) at ${w}x$h")
    }
  }

  test("Codecs: JPEG lossy round-trip bounded; multi-block DC chain; " +
      "standard table") {
    import graft.multimodal.Codecs
    // flat quant: loss = DCT round-off only. 64x48 = 48 blocks, so the
    // DC differential chain, ZRL, EOB and byte stuffing all run.
    val w = 64; val h = 48
    val px = (x: Int, y: Int) => (x * 3 + y * 2 + (x * y) % 5) % 256
    val img = Codecs.decodeJpegGray(
      Codecs.encodeJpegGray(w, h, px, Codecs.JpegFlatQuant))
    assert(img.width == w && img.height == h)
    var maxErr = 0
    for (y <- 0 until h; x <- 0 until w)
      maxErr = math.max(maxErr, math.abs(img.pixels(y)(x) - px(x, y)))
    assert(maxErr <= 2, s"round-off error $maxErr > 2 at quant 1")
    // standard Annex-K table on a constant image: DC quant 16 rounds
    // 8*(v-128) to the nearest 16, so pixels land within ±1
    val flat = Codecs.decodeJpegGray(
      Codecs.encodeJpegGray(24, 24, (_, _) => 77))
    for (y <- 0 until 24; x <- 0 until 24)
      assert(math.abs(flat.pixels(y)(x) - 77) <= 1)
  }

  test("Codecs: malformed JPEGs are rejected, never mis-decoded") {
    import graft.multimodal.Codecs
    val good = Codecs.encodeJpegGray(16, 16,
      (x, y) => (x * 7 + y * 13) % 256)
    // bad SOI
    intercept[IllegalArgumentException](
      Codecs.decodeJpegGray("XX".getBytes ++ good.drop(2)))
    // progressive SOF: patch the SOF0 marker byte 0xC0 -> 0xC2
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e1 = intercept[IllegalArgumentException](
      Codecs.decodeJpegGray(prog))
    assert(e1.getMessage.contains("SOF"), e1.getMessage)
    // truncated entropy stream (cut well before EOI)
    intercept[IllegalArgumentException](
      Codecs.decodeJpegGray(good.take(good.length - 40)))
    // lost EOI only
    intercept[IllegalArgumentException](
      Codecs.decodeJpegGray(good.take(good.length - 2)))
    // nonzero restart interval: splice a DRI segment before SOS
    val sosAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val dri = Array[Byte](0xff.toByte, 0xdd.toByte, 0, 4, 0, 8)
    val withDri = good.take(sosAt) ++ dri ++ good.drop(sosAt)
    val e2 = intercept[IllegalArgumentException](
      Codecs.decodeJpegGray(withDri))
    assert(e2.getMessage.contains("restart"), e2.getMessage)
    // 16-bit quant table: set Pq high nibble in the DQT header byte
    val dqtAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xdb).get
    val wideQ = good.clone()
    wideQ(dqtAt + 4) = 0x10.toByte
    val e3 = intercept[IllegalArgumentException](
      Codecs.decodeJpegGray(wideQ))
    assert(e3.getMessage.contains("16-bit"), e3.getMessage)
    // Long-math marker-segment guard: huge declared segment length
    val evil = good.clone()
    evil(dqtAt + 2) = 0x7f.toByte; evil(dqtAt + 3) = 0xff.toByte
    val e4 = intercept[IllegalArgumentException](
      Codecs.decodeJpegGray(evil))
    assert(e4.getMessage.contains("overruns"), e4.getMessage)
    // the quarantine seam routes all of these as Left
    assert(Codecs.tryDecode(Codecs.decodeJpegGray(prog)).isLeft)
    assert(Codecs.tryDecode(Codecs.decodeJpegGray(good)).isRight)
  }

  test("Codecs: Long-math chunk guards + inflate non-progress rejection") {
    import graft.multimodal.Codecs
    // WAV chunk declaring len near Int.MaxValue: Int math wraps
    // off+8+len negative and slips the guard; the Long-math bound must
    // reject it as a validated overrun, not AIOOBE/OOM
    val wav = Codecs.encodeWavPcm16(8000, 1, Array(1, 2, 3))
    val evilWav = wav.clone()
    // 'fmt ' chunk length field lives at offset 16 (le32)
    evilWav(16) = 0xf0.toByte; evilWav(17) = 0xff.toByte
    evilWav(18) = 0xff.toByte; evilWav(19) = 0x7f.toByte
    val e1 = intercept[IllegalArgumentException](
      Codecs.decodeWavPcm16(evilWav))
    assert(e1.getMessage.contains("overruns"), e1.getMessage)
    // same trap on PNG's big-endian chunk length (IHDR len at offset 8)
    val png = Codecs.encodePng(4, 4, (x, y) => x + y)
    val evilPng = png.clone()
    evilPng(8) = 0x7f.toByte; evilPng(9) = 0xff.toByte
    evilPng(10) = 0xff.toByte; evilPng(11) = 0xf0.toByte
    val e2 = intercept[IllegalArgumentException](Codecs.decodePng(evilPng))
    assert(e2.getMessage.contains("overruns"), e2.getMessage)
    // preset-dictionary zlib IDAT: inflate() returns 0 with
    // needsInput=false and finished=false forever — the decoder must
    // throw (unsupported), not spin the inflate loop
    val defl = new java.util.zip.Deflater()
    defl.setDictionary("graftdict".getBytes("US-ASCII"))
    defl.setInput(new Array[Byte](4 * 5)); defl.finish()
    val buf = new Array[Byte](256)
    val bos = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
      0x1a, 0x0a))
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(Array[Byte]((body.length >>> 24).toByte,
        (body.length >>> 16).toByte, (body.length >>> 8).toByte,
        body.length.toByte))
      val payload = tag.getBytes("US-ASCII") ++ body
      out.write(payload)
      val c = new java.util.zip.CRC32(); c.update(payload)
      val v = c.getValue.toInt
      out.write(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte))
    }
    chunk("IHDR", Array[Byte](0, 0, 0, 4, 0, 0, 0, 4, 8, 0, 0, 0, 0))
    chunk("IDAT", bos.toByteArray)
    chunk("IEND", Array.empty)
    val e3 = intercept[IllegalArgumentException](
      Codecs.decodePng(out.toByteArray))
    assert(e3.getMessage.contains("IDAT"), e3.getMessage)
  }

  test("Codecs: header-declared dims are bounded by the bytes present " +
      "(crafted tiny files cannot force gigabyte allocations)") {
    import graft.multimodal.Codecs
    // JPEG: SOF0 declaring 65535x65535 in a ~200-byte file must be a
    // validated failure BEFORE the pixel matrix allocates ~17 GB
    val good = Codecs.encodeJpegGray(16, 16, (x, y) => (x + y) % 256)
    val sofAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0).get
    val huge = good.clone()
    huge(sofAt + 5) = 0xff.toByte; huge(sofAt + 6) = 0xff.toByte
    huge(sofAt + 7) = 0xff.toByte; huge(sofAt + 8) = 0xff.toByte
    val e1 = intercept[IllegalArgumentException](
      Codecs.decodeJpegGray(huge))
    assert(e1.getMessage.contains("exceeds"), e1.getMessage)
    // JPEG: SOS declaring an empty body must fail validation, not
    // read header fields out of the entropy stream (or off the end)
    val sosAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val shortSos = good.clone()
    shortSos(sosAt + 2) = 0; shortSos(sosAt + 3) = 2
    val e2 = intercept[IllegalArgumentException](
      Codecs.decodeJpegGray(shortSos))
    assert(e2.getMessage.contains("short SOS"), e2.getMessage)
    // PNG chunk builder (the Long-math test's idiom)
    def png(ihdr: Array[Byte], idat: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a,
        0x1a, 0x0a))
      def chunk(tag: String, body: Array[Byte]): Unit = {
        out.write(Array[Byte]((body.length >>> 24).toByte,
          (body.length >>> 16).toByte, (body.length >>> 8).toByte,
          body.length.toByte))
        val payload = tag.getBytes("US-ASCII") ++ body
        out.write(payload)
        val c = new java.util.zip.CRC32(); c.update(payload)
        val v = c.getValue.toInt
        out.write(Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
          (v >>> 8).toByte, v.toByte))
      }
      chunk("IHDR", ihdr)
      chunk("IDAT", idat)
      chunk("IEND", Array.empty)
      out.toByteArray
    }
    // PNG: width=0x7FFFFFFF, height=1 passes the >0 dim check but
    // height*(width+1) wraps Int — must be the validated "exceeds"
    // failure, not NegativeArraySizeException / OOM
    val evilDims = png(
      Array[Byte](0x7f, 0xff.toByte, 0xff.toByte, 0xff.toByte,
        0, 0, 0, 1, 8, 0, 0, 0, 0),
      Array[Byte](0x78, 0x9c.toByte, 0x03, 0x00, 0x00, 0x00, 0x00, 0x01))
    val e3 = intercept[IllegalArgumentException](Codecs.decodePng(evilDims))
    assert(e3.getMessage.contains("exceeds"), e3.getMessage)
    // PNG: structurally valid chunks whose IDAT body is not a zlib
    // stream — DataFormatException must surface as the contract's
    // IllegalArgumentException, inside the quarantine seam
    val badZlib = png(
      Array[Byte](0, 0, 0, 4, 0, 0, 0, 4, 8, 0, 0, 0, 0),
      Array[Byte](0x11, 0x22, 0x33, 0x44, 0x55, 0x66))
    val e4 = intercept[IllegalArgumentException](Codecs.decodePng(badZlib))
    assert(e4.getMessage.contains("IDAT"), e4.getMessage)
    assert(Codecs.tryDecode(Codecs.decodePng(badZlib)).isLeft)
    // WAV: channels=0 from a corrupt fmt chunk is a validated failure
    val wav = Codecs.encodeWavPcm16(8000, 1, Array(1, 2, 3))
    val zeroCh = wav.clone()
    zeroCh(22) = 0; zeroCh(23) = 0
    val e5 = intercept[IllegalArgumentException](
      Codecs.decodeWavPcm16(zeroCh))
    assert(e5.getMessage.contains("channel"), e5.getMessage)
  }

  test("decode/resize stubs are total on NULL payloads (nullable " +
      "source column), never NPE-ing the task") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "some text"), (2L, null: String))
      .toDF("doc_id", "text")
    val payloads = Multimodal.withPayload(docs)
    val dec = Multimodal.decodeStub(spark, payloads)
      .orderBy("doc_id").collect()
    assert(dec.length == 2, "every input row accounted")
    assert(dec(1).getInt(1) == 16 && dec(1).getInt(2) == 16 &&
      dec(1).getDouble(3) == 0.0,
      "NULL payload decodes as the empty payload")
    val res = Multimodal.resizeStub(spark, payloads)
      .orderBy("doc_id").collect()
    assert(res.length == 2 && res(1).getLong(1) == 0L &&
      res(1).getLong(2) == 0L,
      "NULL payload resizes as the empty payload")
  }

  test("decodeStub: fixed feature schema, deterministic values") {
    val payloads = Multimodal.withPayload(Tables(spark, sf, "documents"))
    val f1 = Multimodal.decodeStub(spark, payloads).orderBy("doc_id")
      .collect()
    val f2 = Multimodal.decodeStub(spark, payloads).orderBy("doc_id")
      .collect()
    assert(f1.nonEmpty)
    assert(f1.toSeq == f2.toSeq, "stub decode is deterministic")
    assert(Multimodal.decodeStub(spark, payloads).schema ==
      Multimodal.featuresType)
    val r = f1.head
    assert(r.getInt(1) >= 16 && r.getInt(1) < 32) // fake width bounds
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 255.0)
  }

  test("pcm16_window_ss equals the hex-conv composition on adversarial payloads") {
    graft.GraftExtensions.ensure(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    // empty, sub-window, odd byte count, exact 1/2/3 windows, random
    val payloads: Seq[Array[Byte]] =
      Seq(Array.emptyByteArray,
        Array.fill(7)(rnd.nextInt.toByte),
        Array.fill(127)(rnd.nextInt.toByte),
        Array.fill(128)(rnd.nextInt.toByte),
        Array.fill(129)(rnd.nextInt.toByte),
        Array.fill(256)(rnd.nextInt.toByte),
        Array.fill(384)(rnd.nextInt.toByte)) ++
        (0 until 40).map(_ => Array.fill(rnd.nextInt(600))(rnd.nextInt.toByte))
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("id", "payload")
    val out = df
      .withColumn("h", hex(col("payload")))
      .withColumn("n_win", (octet_length(col("payload")) / 2 / 64).cast("int"))
      .withColumn("native", expr("pcm16_window_ss(payload, 64)"))
      .withColumn("builtin", expr("""
        transform(sequence(0, n_win - 1),
          win -> aggregate(
            transform(sequence(0, 63),
              j -> CAST(conv(substr(h, (win*64 + j)*4 + 1, 4), 16, 10)
                   AS BIGINT) - 32768),
            CAST(0 AS BIGINT), (acc, v) -> acc + v * v))"""))
      .select(col("id"), col("n_win"), col("native"), col("builtin"))
      .collect()
    out.foreach { r =>
      val native = r.getSeq[Long](2)
      // sequence(0, -1) descends: the builtin form needs the n_win>0
      // guard the face applies — normalize here
      val builtin = if (r.getInt(1) <= 0) Seq.empty[Long] else r.getSeq[Long](3)
      assert(native == builtin, s"payload ${r.getLong(0)}")
    }
  }
}
