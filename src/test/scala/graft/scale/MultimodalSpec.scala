package graft.scale

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world payload content for multimodal testing"),
    (2L, "x"),
    (3L, "a" * 5000)).toDF("doc_id", "text")

  private def withPayload = Multimodal.withBinaryPayload(docs, "text")

  test("decodeMeta: deterministic fake decode over binary payloads") {
    val meta = Multimodal.decodeMeta(withPayload, "doc_id", "payload").collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 50)
    assert(Set("png", "jpeg", "webp").contains(meta(1L).format))
    assert(meta(1L).width >= 64 && meta(1L).width < 256)
    // determinism: same payload → same checksum
    val again = Multimodal.decodeMeta(withPayload, "doc_id", "payload").collect()
      .map(m => m.doc_id -> m.checksum).toMap
    assert(meta.forall { case (id, m) => again(id) == m.checksum })
  }

  test("resize: bounded output payload with target dimensions") {
    val out = Multimodal.resize(withPayload, "doc_id", "payload", 128, 128).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getInt(1) == 128 && out(3L).getInt(2) == 128)
    assert(out(3L).getAs[Array[Byte]](3).length <= 128 * 128 / 64)
    assert(out(2L).getAs[Array[Byte]](3).length == 1)
  }

  test("sampleFrames: one row per sampled frame with frame indices") {
    val frames = Multimodal.sampleFrames(withPayload, "doc_id", "payload",
      frameSize = 1000, every = 2).collect()
    val byDoc = frames.groupBy(_.getLong(0))
    assert(byDoc(3L).length == 3) // 5000B / 1000B = 5 frames, every 2nd → 0,2,4
    assert(byDoc(3L).map(_.getInt(1)).sorted.toSeq == Seq(0, 2, 4))
    assert(byDoc(2L).length == 1)
  }

  test("extractFeatures: L1-normalized fixed-dim histogram") {
    val f = Multimodal.extractFeatures(withPayload, "doc_id", "payload", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(f(1L).length == 8)
    assert(math.abs(f(1L).sum - 1.0) < 1e-9)
  }

  test("perceptualHash: hand-computed bits; identical payloads collide, distinct ones do not") {
    import org.apache.spark.sql.functions.col
    // short payload (n=4 < cells): step=1, cells 0..3, v=[10,200,10,200],
    // mean=105 → bits 1 and 3 set → fp = 0b1010 = 10
    val tiny = Seq((1L, Array[Byte](10, -56, 10, -56))).toDF("doc_id", "payload")
    val fp1 = Multimodal.perceptualHash(tiny, "doc_id", "payload")
      .head().getLong(1)
    assert(fp1 == 10L)
    // re-encode shape: identical bytes hash identically; a different
    // byte pattern lands far away; the banded Hamming join finds
    // exactly the planted pair
    val imgA = Array.tabulate(600)(i => ((i * 37) % 251).toByte)
    val imgB = Array.tabulate(600)(i => ((i * 113 + 7) % 251).toByte)
    val d = Seq((1L, imgA), (2L, imgA.clone), (3L, imgB)).toDF("doc_id", "payload")
    val fps = Multimodal.perceptualHash(d, "doc_id", "payload")
    val pairs = Dedup.nearDupByFingerprint(fps, "doc_id", "phash",
      maxHamming = 4, fpBits = 60, maxBucketSize = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // null payload hashes to 0, not a crash
    val withNull = Seq((9L, null.asInstanceOf[Array[Byte]])).toDF("doc_id", "payload")
    assert(Multimodal.perceptualHash(withNull, "doc_id", "payload").head().getLong(1) == 0L)
  }

  /** A real 8x6 RGB gradient, encoded with the JDK's own writers —
    * round-tripping through genuinely-encoded PNG/BMP bytes is the
    * real-decode fixture (no binary blob checked in). */
  private def fixtureImage(): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, ((x * 30) << 16) | ((y * 40) << 8) | ((x + y) * 10))
    img
  }

  private def encode(fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(fixtureImage(), fmt, bos),
      s"JDK must ship a $fmt writer")
    bos.toByteArray
  }

  test("decodeMetaImageIO: real PNG/BMP decode; garbage payloads stay in-band") {
    val png = encode("png"); val bmp = encode("bmp")
    val junk = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val df = Seq((1L, png), (2L, bmp), (3L, junk)).toDF("doc_id", "payload")
    val m = Multimodal.decodeMetaImageIO(df, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    assert(m(1L).format === "png" && m(1L).width === 8 && m(1L).height === 6)
    assert(m(2L).format === "bmp" && m(2L).width === 8 && m(2L).height === 6)
    assert(m(1L).n_bytes === png.length.toLong && m(2L).n_bytes === bmp.length.toLong)
    assert(m(3L).format === "undecodable" && m(3L).width === 0 && m(3L).height === 0)
  }

  test("decodeMetaImageIO: decompression-bomb headers reject before allocation") {
    // a tiny payload whose IHDR claims 100000x100000 would allocate a
    // ~40 GB BufferedImage if read blindly; the dimension guard must
    // reject it as undecodable from the header alone. Craft it by
    // patching a REAL png's IHDR (width@16, height@20) and fixing the
    // chunk CRC so the reader parses the header as valid.
    val png = encode("png")
    val bomb = png.clone()
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = (v >>> 24).toByte; bomb(off + 1) = (v >>> 16).toByte
      bomb(off + 2) = (v >>> 8).toByte; bomb(off + 3) = v.toByte
    }
    putInt(16, 100000); putInt(20, 100000)
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17) // chunk type "IHDR" + 13 data bytes
    putInt(29, crc.getValue.toInt)
    val df = Seq((1L, bomb), (2L, png)).toDF("doc_id", "payload")
    val m = Multimodal.decodeMetaImageIO(df, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    assert(m(1L).format === "undecodable" && m(1L).width === 0 && m(1L).height === 0)
    assert(m(2L).format === "png" && m(2L).width === 8) // guard is surgical
  }

  test("perceptualHashImage + extractFeaturesImage: encoding-invariant (PNG == BMP of the same pixels)") {
    val df = Seq((1L, encode("png")), (2L, encode("bmp")),
      (3L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    val ph = Multimodal.perceptualHashImage(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(1L) === ph(2L),
      "two lossless encodings of the same pixels must hash identically")
    assert(ph(1L) !== 0L)
    assert(ph(3L) === 0L) // undecodable, in-band
    val fx = Multimodal.extractFeaturesImage(df, "doc_id", "payload", dim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(fx(1L) === fx(2L))
    assert(math.abs(fx(1L).sum - 1.0) < 1e-9)
    assert(fx(3L).forall(_ === 0.0))
  }

  test("resizeImage: nearest-neighbor pixels survive the PNG re-encode roundtrip") {
    val df = Seq((1L, encode("png"))).toDF("doc_id", "payload")
    val out = Multimodal.resizeImage(df, "doc_id", "payload",
      targetW = 4, targetH = 3).collect().head
    assert(out.getInt(1) === 4 && out.getInt(2) === 3)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](3)))
    assert(img.getWidth === 4 && img.getHeight === 3)
    val src = fixtureImage()
    // nearest-neighbor map: out(x, y) == src(x*8/4, y*6/3), bit-exact
    // through the lossless PNG roundtrip
    for (y <- 0 until 3; x <- 0 until 4)
      assert((img.getRGB(x, y) & 0xffffff) === (src.getRGB(x * 2, y * 2) & 0xffffff))
  }

  // ---- REAL audio (javax.sound.sampled) -----------------------------

  /** Encode `samples` as PCM16 mono WAV via the JDK's OWN encoder — an
    * independent container layout to pin invariance against the
    * canonical wavBytes header. */
  private def jdkWav(samples: Array[Short], rate: Int): Array[Byte] = {
    val data = new Array[Byte](2 * samples.length)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("wavPayload + decodeAudioMeta: real JDK decode of the canonical header; garbage in-band") {
    val wav = Multimodal.wavPayload(docs, "doc_id", "text", sampleRate = 16000)
    val m = Multimodal.decodeAudioMeta(wav, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    // doc 1: 50 text bytes -> 50-byte (already even) data, 25 frames
    assert(m(1L).format === "wave" && m(1L).sample_rate === 16000)
    assert(m(1L).channels === 1 && m(1L).bits === 16)
    assert(m(1L).n_bytes === 44L + 50L && m(1L).n_frames === 25L)
    // doc 2: one byte pads to a single frame
    assert(m(2L).n_frames === 1L && m(2L).n_bytes === 46L)
    // garbage payload surfaces as undecodable, not a throw
    val junk = Seq((9L, Array.tabulate[Byte](64)(i => (i * 13).toByte)))
      .toDF("doc_id", "payload")
    val u = Multimodal.decodeAudioMeta(junk, "doc_id", "payload").collect().head
    assert(u.format === "undecodable" && u.sample_rate === 0 && u.n_frames === 0L)
  }

  test("audioFrameFeatures: hand-checked energy and zero-crossing lattice") {
    // samples 1000, -1000, 2000: frames of 2 -> frame 0 = {1000, -1000}
    // (energy 2e6, one sign flip), frame 1 = {2000} (energy 4e6, none)
    val wav = jdkWav(Array[Short](1000, -1000, 2000), 8000)
    val df = Seq((1L, wav)).toDF("doc_id", "payload")
    val got = Multimodal.audioFrameFeatures(df, "doc_id", "payload", frameSamples = 2)
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0) === ((2L, 2000000L, 1L)))
    assert(got(1) === ((1L, 4000000L, 0L)))
    // undecodable payloads emit an EMPTY lattice (in-band)
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Multimodal.audioFrameFeatures(junk, "doc_id", "payload").count() === 0L)
  }

  test("audioFingerprint: container-invariant (canonical header == JDK encoder of the same PCM)") {
    // deterministic pseudo-speech: alternating loud/quiet windows so the
    // aHash has structure
    val samples = Array.tabulate[Short](600)(i =>
      (if ((i / 60) % 2 == 0) (i % 7) * 900 - 2700 else (i % 3) * 10 - 10).toShort)
    val data = new Array[Byte](1200)
    var i = 0
    while (i < 600) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val canonical = Multimodal.wavBytes(data, 16000)
    // a second VALID container of the same PCM: the JDK encoder happens
    // to emit the canonical 44-byte layout byte-for-byte, so splice a
    // LIST/INFO chunk between "fmt " and "data" (readers must skip
    // unknown chunks) and patch the RIFF size
    val jdk = {
      val base = jdkWav(samples, 16000)
      assert(base sameElements canonical, "layout drift: update this container test")
      val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
      val out = new Array[Byte](base.length + extra.length)
      System.arraycopy(base, 0, out, 0, 36)              // RIFF..fmt chunk
      System.arraycopy(extra, 0, out, 36, extra.length)  // LIST chunk
      System.arraycopy(base, 36, out, 36 + extra.length, base.length - 36)
      val riffLen = out.length - 8
      out(4) = (riffLen & 0xff).toByte; out(5) = ((riffLen >> 8) & 0xff).toByte
      out(6) = ((riffLen >> 16) & 0xff).toByte; out(7) = ((riffLen >> 24) & 0xff).toByte
      out
    }
    assert(!(canonical sameElements jdk), "containers must differ for the test to mean anything")
    val df = Seq((1L, canonical), (2L, jdk),
      (3L, Array[Byte](9, 9, 9))).toDF("doc_id", "payload")
    val fp = Multimodal.audioFingerprint(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L), "same PCM in two containers must fingerprint identically")
    assert(fp(1L) !== 0L)
    assert(fp(3L) === 0L, "undecodable hashes to 0 in-band")
  }

  test("decodeAudioMeta: AIFF rides the AudioSystem fallback (big-endian PCM16) with WAV-equal features") {
    val samples = Array.tabulate[Short](90)(i => (i * 321 - 9000).toShort)
    val aiff = {
      val data = new Array[Byte](2 * samples.length)
      var i = 0
      while (i < samples.length) { // AIFF is big-endian PCM
        data(2 * i) = ((samples(i) >> 8) & 0xff).toByte
        data(2 * i + 1) = (samples(i) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
      bos.toByteArray
    }
    val df = Seq((1L, aiff), (2L, jdkWav(samples, 8000))).toDF("doc_id", "payload")
    val m = Multimodal.decodeAudioMeta(df, "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    assert(m(1L).format === "aiff" && m(1L).sample_rate === 8000 &&
      m(1L).n_frames === 90L)
    // same PCM through the fallback (AIFF, big-endian) and the fast
    // RIFF path (WAV, little-endian) must produce identical features
    val f = Multimodal.audioFrameFeatures(df, "doc_id", "payload", frameSamples = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(r =>
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq }
    assert(f(1L) === f(2L))
  }

  test("resampleAudio: nearest-neighbor sample map survives the WAV re-encode roundtrip") {
    val samples = Array.tabulate[Short](100)(i => (i * 123 - 6000).toShort)
    val df = Seq((1L, jdkWav(samples, 16000))).toDF("doc_id", "payload")
    val out = Multimodal.resampleAudio(df, "doc_id", "payload", targetRate = 8000)
      .collect().head
    assert(out.getInt(1) === 8000 && out.getLong(2) === 50L)
    // decode the emitted payload with the JDK and pin the integer map:
    // out(j) == src(j * 100 / 50)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](3)))
    val ba = ais.readAllBytes()
    assert(ba.length === 100)
    for (j <- 0 until 50) {
      val v = ((java.lang.Byte.toUnsignedInt(ba(2 * j + 1)) << 8) |
        java.lang.Byte.toUnsignedInt(ba(2 * j))).toShort
      assert(v === samples(j * 2), s"sample $j")
    }
  }
}
