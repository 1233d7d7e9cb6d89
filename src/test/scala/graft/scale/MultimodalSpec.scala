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
}
