package graft.scale

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class VideoSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def frameOf(bytes: Int => Int): Array[Byte] =
    Array.tabulate[Byte](Video.FixtureFrameBytes)(i => bytes(i).toByte)

  test("aviPayload + decodeVideoMeta: real RIFF/AVI walk; sizes and counts pinned") {
    val docs = Seq((1L, "x" * 200), (2L, ""), (3L, "y" * 2000)).toDF("doc_id", "text")
    val m = Video.decodeVideoMeta(
      Video.aviPayload(docs, "doc_id", "text"), "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    // 200 bytes -> ceil(200/144) = 2 frames; container = 224 + 152*2
    assert(m(1L).format === "avi" && m(1L).width === 8 && m(1L).height === 6)
    assert(m(1L).n_frames === 2L && m(1L).n_bytes === 224L + 304L)
    assert(m(1L).us_per_frame === 40000L)
    // empty text -> one black frame
    assert(m(2L).n_frames === 1L && m(2L).n_bytes === 224L + 152L)
    // 2000 bytes -> ceil = 14, capped at the 8-frame fixture max
    assert(m(3L).n_frames === 8L)
    // garbage payload stays in-band
    val junk = Seq((9L, Array.tabulate[Byte](80)(i => (i * 11).toByte)))
      .toDF("doc_id", "payload")
    val u = Video.decodeVideoMeta(junk, "doc_id", "payload").collect().head
    assert(u.format === "undecodable" && u.n_frames === 0L)
  }

  test("parseAvi: lying chunk sizes and compressed codecs reject in-band") {
    val good = Video.aviBytes(Seq(frameOf(_ => 0)), 8, 6, 40000)
    // claim a movi frame bigger than the payload: bounds check fires
    val lying = good.clone()
    val dataOff = good.length - Video.FixtureFrameBytes - 8
    lying(dataOff + 4) = -1; lying(dataOff + 5) = -1
    lying(dataOff + 6) = -1; lying(dataOff + 7) = 0x7f.toByte
    assert(Video.parseAvi(lying).isEmpty)
    // a compressed codec (biCompression != 0) has no JDK decoder
    val mjpg = good.clone()
    // strf body: biCompression at offset 16; strf body starts right
    // after the 'strf'+len header — locate it by scanning for the tag
    val strfAt = (0 until mjpg.length - 4).find(i =>
      mjpg(i) == 's' && mjpg(i + 1) == 't' && mjpg(i + 2) == 'r' && mjpg(i + 3) == 'f').get
    mjpg(strfAt + 8 + 16) = 1
    assert(Video.parseAvi(mjpg).isEmpty)
    assert(Video.parseAvi(good).nonEmpty, "the guards are surgical")
  }

  test("videoFrameFeatures: hand-checked luma lattice") {
    // frame of a single known BGR triple everywhere: b=10 g=20 r=30 ->
    // luma = (299*30 + 587*20 + 114*10) / 1000 = (8970+11740+1140)/1000 = 21
    val f = frameOf(i => Seq(10, 20, 30)(i % 3))
    val avi = Video.aviBytes(Seq(f, frameOf(_ => 0)), 8, 6, 40000)
    val df = Seq((1L, avi)).toDF("doc_id", "payload")
    val got = Video.videoFrameFeatures(df, "doc_id", "payload")
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(0) === ((48L, 48L * 21L, 21L)))
    assert(got(1) === ((48L, 0L, 0L)))
    // undecodable -> empty lattice
    val junk = Seq((2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    assert(Video.videoFrameFeatures(junk, "doc_id", "payload").count() === 0L)
  }

  test("videoFingerprint: container-invariant (extra chunk re-mux == canonical)") {
    // two frames with structure: a bright frame and a dark frame
    val frames = Seq(frameOf(i => 200 + i % 20), frameOf(i => i % 5))
    val canonical = Video.aviBytes(frames, 8, 6, 40000)
    // re-mux: splice a JUNK chunk between hdrl and movi, patch RIFF size
    val remux = {
      val insertAt = {
        val moviAt = (0 until canonical.length - 4).find(i =>
          canonical(i) == 'm' && canonical(i + 1) == 'o' &&
            canonical(i + 2) == 'v' && canonical(i + 3) == 'i').get
        moviAt - 8 // before the movi LIST header
      }
      val extra = Array[Byte]('J', 'U', 'N', 'K', 4, 0, 0, 0, 1, 2, 3, 4)
      val out = new Array[Byte](canonical.length + extra.length)
      System.arraycopy(canonical, 0, out, 0, insertAt)
      System.arraycopy(extra, 0, out, insertAt, extra.length)
      System.arraycopy(canonical, insertAt, out, insertAt + extra.length,
        canonical.length - insertAt)
      val riffLen = out.length - 8
      out(4) = (riffLen & 0xff).toByte; out(5) = ((riffLen >> 8) & 0xff).toByte
      out(6) = ((riffLen >> 16) & 0xff).toByte; out(7) = ((riffLen >> 24) & 0xff).toByte
      out
    }
    assert(!(canonical sameElements remux))
    val df = Seq((1L, canonical), (2L, remux),
      (3L, Array[Byte](7, 7, 7))).toDF("doc_id", "payload")
    val fp = Video.videoFingerprint(df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L), "same frames in two containers must fingerprint identically")
    assert(fp(1L) !== 0L)
    assert(fp(3L) === 0L, "undecodable hashes to 0 in-band")
  }

  test("frameToImage bridges raw-DIB frames into the javax.imageio path, bottom-up rows") {
    // bottom DIB row (y = 5 in image space) is red, the rest black
    val f = new Array[Byte](Video.FixtureFrameBytes)
    for (x <- 0 until 8) f(x * 3 + 2) = 0xff.toByte // first stored row, R channel
    val avi = Video.aviBytes(Seq(f), 8, 6, 40000)
    val df = Seq((1L, avi)).toDF("doc_id", "payload")
    val out = Video.frameToImage(df, "doc_id", "payload", frameIndex = 0)
      .collect().head
    assert(out.getInt(2) === 8 && out.getInt(3) === 6)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.getAs[Array[Byte]](4)))
    assert((img.getRGB(0, 5) & 0xffffff) === 0xff0000, "DIB bottom row = image bottom row")
    assert((img.getRGB(0, 0) & 0xffffff) === 0x000000)
    // and the image-path operators run on it unchanged
    val ph = Multimodal.perceptualHashImage(
      Video.frameToImage(df, "doc_id", "payload").select("doc_id", "payload"),
      "doc_id", "payload").collect().head
    assert(ph.getLong(1) !== 0L)
    // a frame index past the end emits nothing (in-band)
    assert(Video.frameToImage(df, "doc_id", "payload", frameIndex = 5).count() === 0L)
  }

  test("MJPEG: real JPEG encode/decode round-trip; container facts exact, pixels near") {
    val docs = Seq((1L, "x" * 200), (2L, ""), (3L, "y" * 2000)).toDF("doc_id", "text")
    val m = Video.decodeVideoMeta(
      Video.aviMjpegPayload(docs, "doc_id", "text"), "doc_id", "payload")
      .collect().map(r => r.doc_id -> r).toMap
    // container facts match the raw-DIB path exactly (same clamp)
    assert(m(1L).format === "mjpeg" && m(1L).width === 8 && m(1L).height === 6)
    assert(m(1L).n_frames === 2L && m(1L).us_per_frame === 40000L)
    assert(m(2L).n_frames === 1L)
    assert(m(3L).n_frames === 8L)
    // JPEG is lossy but near: per-frame mean luma within a small band
    // of the raw-DIB decode of the SAME text
    val raw = Video.videoFrameFeatures(
      Video.aviPayload(docs, "doc_id", "text"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    val jpg = Video.videoFrameFeatures(
      Video.aviMjpegPayload(docs, "doc_id", "text"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(jpg.keySet === raw.keySet, "same frame lattice through both codecs")
    jpg.foreach { case (k, v) =>
      assert(math.abs(v - raw(k)) <= 16L,
        s"frame $k mean luma drifted ${math.abs(v - raw(k))} (jpeg $v vs raw ${raw(k)})")
    }
    // a solid-color frame survives JPEG almost exactly (DC-only):
    // empty text -> black frames -> luma 0 both paths
    assert(jpg((2L, 0)) === 0L && raw((2L, 0)) === 0L)
    // decode is deterministic: two independent decodes agree bitwise
    val fp1 = Video.videoFingerprint(
      Video.aviMjpegPayload(docs, "doc_id", "text"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fp2 = Video.videoFingerprint(
      Video.aviMjpegPayload(docs, "doc_id", "text"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp1 === fp2)
    // and the frame bridge runs on MJPEG frames unchanged
    val br = Video.frameToImage(
      Video.aviMjpegPayload(docs, "doc_id", "text"), "doc_id", "payload")
    assert(br.count() === 3L)
  }

  test("MJPEG: a corrupt JPEG frame rejects the container in-band") {
    // build a valid MJPEG payload, then corrupt the JPEG body bytes
    val payload = Video.aviMjpegPayload(
      Seq((1L, "hello world")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head.getAs[Array[Byte]]("payload")
    val bad = payload.clone()
    // first frame chunk body starts at movi+4 ('movi') + 8 ('00dc'+len):
    // stomping the SOI/JFIF header makes ImageIO reject the frame
    val moviAt = (0 until bad.length - 4).find(i =>
      bad(i) == 'm' && bad(i + 1) == 'o' && bad(i + 2) == 'v' && bad(i + 3) == 'i').get
    for (k <- 12 until 24) bad(moviAt + k) = 0x55.toByte
    val u = Video.decodeVideoMeta(
      Seq((9L, bad)).toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().head
    assert(u.format === "undecodable" && u.n_frames === 0L)
  }
}
