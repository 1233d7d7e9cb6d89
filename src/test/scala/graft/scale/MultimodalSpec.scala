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
}
