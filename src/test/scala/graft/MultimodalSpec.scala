package graft

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal plumbing: binary payload schema, partition-batched feature
  * extraction (stubbed decode), frame sampling fan-out. */
class MultimodalSpec extends SparkTestBase {

  private lazy val media =
    Multimodal.mediaTable(Tables.documents(spark, Sf0001)).cache()

  // The session is suite-shared: release the fixture cache so the
  // no-pinned-cache invariant in SmokeSpec stays strict.
  override protected def afterAll(): Unit = {
    media.unpersist()
    super.afterAll()
  }

  test("media table schema: binary payload + metadata struct") {
    val f = media.schema("payload")
    assert(f.dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() > 0)
  }

  test("features: 8 normalized bins summing to 1") {
    val rows = Multimodal.extractFeatures(media).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.features.length == 8)
      assert(math.abs(r.features.sum - 1.0) < 1e-9)
      assert(r.n_bytes > 0)
    }
  }

  test("fake decode matches a hand-computed histogram") {
    val payload = "abcabc".getBytes("UTF-8") // a=97%8=1, b=98%8=2, c=99%8=3
    val f = Multimodal.fakeDecodeFeatures(payload)
    assert(f(1) == 2.0 / 6 && f(2) == 2.0 / 6 && f(3) == 2.0 / 6)
    assert(f(0) == 0.0)
  }

  // 4×4 grayscale PNG with known pixel values (r=g=b=v ⇒ BT.601 luma = v
  // exactly; PNG is lossless so decode returns these bytes verbatim).
  private val fixtureLumas =
    Seq(0, 32, 64, 96, 128, 160, 192, 224, 255, 0, 255, 0, 16, 48, 80, 112)

  private def fixturePng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (j <- 0 until 4; i <- 0 until 4) {
      val v = fixtureLumas(j * 4 + i)
      img.setRGB(i, j, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("magic-byte sniffing: PNG and JPEG detected, text is not") {
    val png = fixturePng()
    assert(Multimodal.ImageCodec.isPng(png) && !Multimodal.ImageCodec.isJpeg(png))
    val jpegHeader = Array(0xff, 0xd8, 0xff, 0xe0, 0x00).map(_.toByte)
    assert(Multimodal.ImageCodec.isJpeg(jpegHeader))
    assert(!Multimodal.ImageCodec.isImage("plain text payload".getBytes("UTF-8")))
  }

  test("planted PNG: real pixel decode pins the luma histogram") {
    // luma/32 bins of fixtureLumas: [4,2,2,2,1,1,1,3] of 16 pixels
    val f = Multimodal.decodeFeatures(fixturePng())
    assert(f == Seq(4, 2, 2, 2, 1, 1, 1, 3).map(_ / 16.0))
  }

  test("planted PNG through the Spark stages: features and thumb signature") {
    import spark.implicits._
    val imageMedia = Seq((99L, "image", fixturePng()))
      .toDF("media_id", "kind", "payload")
    val feat = Multimodal.extractFeatures(imageMedia).collect().head
    assert(feat.features == Seq(4, 2, 2, 2, 1, 1, 1, 3).map(_ / 16.0))
    // 4×4 source under the 32-target ⇒ identity NN sample of all 16 lumas
    val thumb = Multimodal.resizeThumbs(imageMedia).collect().head
    assert(thumb.thumb_bytes == 16)
    val expectedSig =
      fixtureLumas.foldLeft(0L)((a, v) => (a * 31 + v) % 1000000007L)
    assert(thumb.thumb_sig == expectedSig)
  }

  test("perceptual aHash: near-identical images collide, different ones do not") {
    // Gradient image; a copy with one slightly-brightened pixel; and its
    // negative. aHash must place the pair within a small hamming radius
    // and the negative at a large one (its bits flip almost everywhere).
    def gradientPng(tweak: Boolean, invert: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        18, 14, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (j <- 0 until 14; i <- 0 until 18) {
        val base = (i * 255) / 17
        val v0 = if (invert) 255 - base else base
        val v = if (tweak && i == 9 && j == 7) math.min(v0 + 40, 255) else v0
        img.setRGB(i, j, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val a = Multimodal.ahash(gradientPng(tweak = false, invert = false))
    val b = Multimodal.ahash(gradientPng(tweak = true, invert = false))
    val c = Multimodal.ahash(gradientPng(tweak = false, invert = true))
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(a >= 0 && b >= 0 && c >= 0, "63-bit hash stays positive")
    assert(hamming(a, b) <= 2, s"near-dup pair too far: ${hamming(a, b)}")
    assert(hamming(a, c) >= 20, s"negative too close: ${hamming(a, c)}")
  }

  test("aHash byte path matches the hand fold") {
    val p = ("abcdefghij" * 20).getBytes("UTF-8")
    val n = p.length
    val vs = Array.tabulate(63)(i => p((i.toLong * n / 63).toInt) & 0xff)
    assert(Multimodal.ahash(p) == Multimodal.ahashFromValues(vs))
    val sum = vs.map(_.toLong).sum
    val expected = vs.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
      if (63L * v > sum) h | (1L << i) else h
    }
    assert(Multimodal.ahash(p) == expected)
  }

  test("aHash properties over random payloads") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.choose(1, 400)
      .flatMap(n => Gen.listOfN(n, Gen.choose(0, 255)))
    (1 to 200).foreach { i =>
      val bytes = gen(Gen.Parameters.default, Seed(i.toLong)).get
        .map(_.toByte).toArray
      val h = Multimodal.ahash(bytes)
      // 63-bit contract: non-negative, and a pure function of the bytes.
      assert(h >= 0L && (h >> 63) == 0L)
      assert(h == Multimodal.ahash(bytes.clone()))
      // Never all-ones: the strict > against the mean leaves at least
      // one below-or-at-mean sample (a minimum always exists).
      assert(h != (1L << 63) - 1)
      // Constant payloads hash to 0 (no sample strictly above the mean).
      val const = Array.fill(bytes.length)(bytes(0))
      assert(Multimodal.ahash(const) == 0L)
    }
  }

  test("corrupt image payload falls back to the byte stub") {
    // PNG magic but garbage body: decode fails, byte histogram applies
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2)
    assert(Multimodal.ImageCodec.decode(junk).isEmpty)
    assert(Multimodal.decodeFeatures(junk) == Multimodal.fakeDecodeFeatures(junk))
  }

  /** Minimal RIFF/WAVE container around centered samples (8-bit PCM
    * stores sample+128 as unsigned bytes). */
  private def fixtureWav(samples: Array[Int], bits: Int = 8,
      channels: Int = 1): Array[Byte] = {
    val data = samples.map(v => (v + 128).toByte)
    val riffSize = 4 + (8 + 16) + (8 + data.length)
    val bb = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(riffSize)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1).putShort(channels.toShort)
    bb.putInt(8000); bb.putInt(8000 * (bits / 8) * channels)
    bb.putShort((bits / 8 * channels).toShort); bb.putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(data.length); bb.put(data)
    bb.array
  }

  test("planted 8-bit PCM WAV: real sample decode + audio stats") {
    // ±50 square wave, 128 samples = 2 frames: every adjacent pair flips
    // sign (63 crossings per 64-sample frame), energy 64·50² = 160000
    // per frame — above the VAD threshold, so both frames are active.
    val planted = Array.tabulate(128)(i => if (i % 2 == 0) 50 else -50)
    val wav = fixtureWav(planted)
    assert(Multimodal.WavCodec.isWav(wav))
    assert(Multimodal.WavCodec.samples(wav).get.toSeq == planted.toSeq)
    val st = Multimodal.audioStats(7L, planted).get
    assert(st.n_frames == 2)
    assert(st.total_energy == 2L * 64 * 2500 && st.max_energy == 160000L)
    assert(st.n_active == 2)
    assert(st.total_zc == 2L * 63)
  }

  test("second-decoder pin: javax.sound decode bit-equals WavCodec") {
    // The fixture above is WRITTEN by the same hand that wrote the
    // parser, so a mirrored container-layout bug would self-consistently
    // cancel out (the r11 PNG pin's rationale, applied to the audio
    // seam). javax.sound.sampled parses the RIFF container and PCM
    // format with none of WavCodec's code in the loop; its byte stream
    // is the independent authority the centered samples must bit-equal.
    // Aperiodic full-range samples, odd count (word-alignment padding in
    // play), so offset/length parse mutations can't alias.
    val planted = Array.tabulate(191)(i => ((i * 37 + 11) % 251) - 125)
    val wav = fixtureWav(planted)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = in.getFormat
    assert(fmt.getEncoding ==
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
    assert(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1)
    assert(fmt.getSampleRate == 8000f)
    val ref = in.readAllBytes().map(b => (b & 0xff) - 128)
    // The independent decode returns the planted samples (pins the
    // FIXTURE, so a later mismatch can only implicate WavCodec)...
    assert(ref.toSeq == planted.toSeq)
    // ...and the parser under test bit-equals it, samples and stats.
    assert(Multimodal.WavCodec.samples(wav).get.toSeq == ref.toSeq)
    assert(Multimodal.audioStats(1L, Multimodal.WavCodec.samples(wav).get)
      == Multimodal.audioStats(1L, ref))
  }

  test("WAV seam: non-PCM8 and non-WAV payloads fall back to raw bytes") {
    assert(!Multimodal.WavCodec.isWav("just some text payload".getBytes))
    // a valid container but 16-bit samples: parse declines, byte
    // fallback applies (the stage treats the payload as raw bytes)
    val wav16 = fixtureWav(Array.fill(64)(10), bits = 16)
    assert(Multimodal.WavCodec.isWav(wav16))
    assert(Multimodal.WavCodec.samples(wav16).isEmpty)
    val stereo = fixtureWav(Array.fill(64)(10), channels = 2)
    assert(Multimodal.WavCodec.samples(stereo).isEmpty)
  }

  test("audio stage: audio-kind slice only, stats match a local recompute") {
    val rows = Multimodal.audioFeatures(media).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.media_id % 3 == 1))
    assert(rows.forall(r => r.n_frames > 0 && r.max_energy <= r.total_energy))
    val one = media.filter(media("media_id") === rows.head.media_id)
      .select("payload").head.getAs[Array[Byte]](0)
    val local = Multimodal.audioStats(rows.head.media_id,
      one.map(b => (b & 0xff) - 128)).get
    assert(local == rows.head)
  }

  test("frame sampling emits fixed-size frames at the stride") {
    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame.length == 16))
    val byId = frames.groupBy(_.media_id)
    byId.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
    }
  }

  // --- second-decoder property pin -----------------------------------------
  //
  // The fixtures above are ENCODED by javax.imageio, so a broken ImageIO
  // decode path (or a wrong luma/sampling constant) could self-consistently
  // cancel out. This fixture is a PNG assembled byte by byte — 8-bit RGB
  // with r=g=b=v (color type 2: grayscale color TYPE 0 would be decoded
  // through ImageIO's linear-gray→sRGB colorspace conversion and getRGB
  // would gamma-shift the planted values; truecolor sRGB is returned
  // verbatim), stored (uncompressed) DEFLATE IDAT — so the pixel values
  // are known a priori with NO encoder library in the loop, and a
  // pure-Scala chunk walk re-derives them independently of ImageIO.

  /** Hand-assembled 16x12 RGB PNG over `pix` (row-major gray values,
    * written as r=g=b triples): signature, IHDR (bit depth 8, color type
    * 2), one IDAT whose zlib stream is a single stored deflate block,
    * IEND. */
  private def storedIdatPng(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val td = typ.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32; crc.update(td)
      be32(data.length) ++ td ++ be32(crc.getValue.toInt)
    }
    // Raw scanlines: per-row filter byte 0 (None) + r,g,b triples.
    val raw = (0 until h).flatMap { y =>
      0.toByte +: (0 until w).flatMap { x =>
        val v = pix(y * w + x).toByte; Seq(v, v, v)
      }
    }.toArray
    // zlib header (0x78 0x01) + stored block (BFINAL=1 BTYPE=00) + adler32.
    val adler = new java.util.zip.Adler32; adler.update(raw)
    val len = raw.length
    val zlib = Array[Byte](0x78, 0x01,
      0x01, (len & 0xff).toByte, (len >>> 8).toByte,
      (~len & 0xff).toByte, ((~len >>> 8) & 0xff).toByte) ++
      raw ++ be32(adler.getValue.toInt)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zlib) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Independent reference decode: walk the chunks, strip the stored-
    * deflate framing by hand (no Inflater — the decoder under test uses
    * one), de-filter the all-zero-filter scanlines. */
  private def refDecodeStoredPng(png: Array[Byte]): (Int, Int, Array[Int]) = {
    def be32(off: Int) =
      ((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
        ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff)
    var off = 8; var w = 0; var h = 0
    val idat = Array.newBuilder[Byte]
    while (off < png.length) {
      val len = be32(off)
      val typ = new String(png, off + 4, 4, "US-ASCII")
      if (typ == "IHDR") { w = be32(off + 8); h = be32(off + 12) }
      if (typ == "IDAT") idat ++= png.slice(off + 8, off + 8 + len)
      off += 12 + len
    }
    val z = idat.result()
    var p = 2 // skip zlib header
    val out = Array.newBuilder[Byte]
    var fin = false
    while (!fin) {
      fin = (z(p) & 1) == 1
      assert(((z(p) >> 1) & 3) == 0, "reference decoder handles stored blocks only")
      val len = (z(p + 1) & 0xff) | ((z(p + 2) & 0xff) << 8)
      out ++= z.slice(p + 5, p + 5 + len)
      p += 5 + len
    }
    val raw = out.result()
    val stride = 3 * w + 1 // filter byte + r,g,b triples
    val pix = (0 until h).flatMap { y =>
      assert(raw(y * stride) == 0, "fixture rows use filter 0")
      (0 until w).map { x =>
        val r = raw(y * stride + 1 + 3 * x) & 0xff
        val g = raw(y * stride + 2 + 3 * x) & 0xff
        val b = raw(y * stride + 3 + 3 * x) & 0xff
        assert(r == g && g == b, "fixture pixels are r=g=b")
        r
      }
    }.toArray
    (w, h, pix)
  }

  test("hand-built stored-IDAT PNG: ImageIO aHash bit-equals the reference decode") {
    val w = 16; val h = 12
    val pix = Array.tabulate(h * w)(k => (k % w * 17 + k / w * 31) % 256)
    val png = storedIdatPng(w, h, pix)
    // The hand-assembly itself is sound: the pure-Scala walk returns the
    // planted pixels (this catches a bug in the FIXTURE, so a later hash
    // mismatch can only implicate the decoder path).
    val (rw, rh, rpix) = refDecodeStoredPng(png)
    assert(rw == w && rh == h && rpix.sameElements(pix))
    // Expected aHash from the planted pixels alone: the published 9x7
    // nearest-neighbor grid (src = floor(i*w/9), floor(j*h/7)) over gray
    // values — grayscale means BT.601 luma(v,v,v) = v exactly — folded by
    // the public ahashFromValues. No ImageIO anywhere on this side.
    val vs = Array.tabulate(Multimodal.AHashBits) { k =>
      val i = k % 9; val j = k / 9
      pix((j * h / 7) * w + (i * w / 9))
    }
    val expected = Multimodal.ahashFromValues(vs)
    // Decoder under test: magic sniff -> ImageIO decode -> luma grid.
    assert(Multimodal.ImageCodec.decode(png).isDefined,
      "ImageIO failed to decode the hand-built PNG")
    assert(Multimodal.ahash(png) == expected,
      "ImageIO decode path diverges from the independent reference decode")
    // And the full thumbnail path agrees on the same independent pixels.
    val lumas = Multimodal.ImageCodec.resizeLuma(
      Multimodal.ImageCodec.decode(png).get, 4)
    val refLumas = Array.tabulate(4 * 4) { k =>
      val i = k % 4; val j = k / 4
      pix((j.toLong * h / 4).toInt * w + (i.toLong * w / 4).toInt)
    }
    assert(lumas.sameElements(refLumas))
  }
}
