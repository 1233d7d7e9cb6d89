package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.4): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a partition-local batch map.
  *
  * The actual media decode is STUBBED (this container ships no image/
  * audio codecs — see `FakeDecode`); everything Spark-side is real:
  * schema, binary column handling, the mapPartitions batch shape (the
  * Scala analogue of `mapInPandas`: one iterator per partition, arbitrary
  * per-batch native calls, constant memory), and partitioning behavior.
  */
object Multimodal {

  /** Typed metadata produced by the decode stage. */
  case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: Long)

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** STUB decode: a real pipeline would call an image/audio codec here
    * (per partition, batched). This deterministic fake derives "format"
    * and "dimensions" from the payload bytes so tests are reproducible.
    */
  object FakeDecode {
    def apply(id: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val head = if (n > 0) java.lang.Byte.toUnsignedInt(bytes(0)) else 0
      val fmt = head % 3 match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      }
      var ck = 1125899906842597L
      var i = 0
      while (i < n) { ck = ck * 31 + bytes(i); i += 1 }
      MediaMeta(id, n.toLong, fmt, 64 + head % 192, 64 + (n % 192), ck)
    }
  }

  /** Attach a binary payload column. With real media data this is the
    * raw file bytes; here the payload is the UTF-8 encoding of a string
    * column (deterministic, lets the rest of the pipeline be exercised
    * end-to-end on the documents table).
    */
  def withBinaryPayload(df: DataFrame, srcCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, graft.ops.Cleaning.qcol(srcCol).cast("binary"))

  /** Decode stage: partition-local batch map over (id, payload) —
    * the Scala shape of `mapInPandas` (iterator in, iterator out; the
    * decode library would be initialized once per partition, not per
    * row). Output is a typed Dataset[MediaMeta].
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init of the (stubbed) codec happens here
        it.map { case (id, bytes) => FakeDecode(id, bytes) }
      }
  }

  /** Resize stage (STUB decode/encode): a real pipeline decodes the image,
    * resamples to targetW×targetH, re-encodes. The deterministic fake
    * subsamples the payload bytes to a `targetW*targetH/64`-byte "image"
    * so output sizes behave like a real resize. Batch shape identical to
    * production (partition-local, iterator in/out).
    */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
      targetW: Int = 256, targetH: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val outBytes = math.max(1, targetW * targetH / 64)
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val out = new Array[Byte](math.min(outBytes, math.max(1, bytes.length)))
          val step = math.max(1, bytes.length / out.length)
          var i = 0
          while (i < out.length && i * step < bytes.length) { out(i) = bytes(i * step); i += 1 }
          (id, targetW, targetH, out)
        }
      }
      .toDF(idCol, "width", "height", "payload")
  }

  /** Frame-sampling stage for video-like payloads (STUB decode): treats the
    * payload as `frameSize`-byte frames and emits every `every`-th frame
    * with its index — the schema/explode shape a real video sampler
    * produces (one row per sampled frame).
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int = 1024, every: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(1, bytes.length / frameSize)
        (0 until nFrames by every).map { f =>
          val from = f * frameSize
          val until = math.min(bytes.length, from + frameSize)
          (id, f, java.util.Arrays.copyOfRange(bytes, from, math.max(from + 1, until)))
        }
      }
      .toDF(idCol, "frame_index", "frame")
  }

  /** Perceptual hash of a payload — the average-hash (aHash) shape
    * image dedup pipelines run after decode: downsample to a fixed
    * `cells`-cell grid, threshold each cell against the grid mean, pack
    * the bits into one long. Near-identical images (re-encodes, minor
    * crops) land within a few bits; pair with
    * [[Dedup.nearDupByFingerprint]] for the banded Hamming join — the
    * image-side analogue of text SimHash dedup.
    *
    * The DECODE is the stub (cell value = payload byte at i×step,
    * step = max(1, n/cells) — the same subsample convention as
    * [[resize]]); a real pipeline substitutes luma averages per grid
    * cell. Default 60 cells keeps the fingerprint positive in a signed
    * long on every engine (same rationale as the portable SimHash).
    * Cell i is present iff i×step < n; mean = Σv/|present| in double;
    * bit i set iff v_i > mean (strict); empty/null payload → 0L.
    */
  def perceptualHash(
      df: DataFrame, idCol: String, payloadCol: String,
      cells: Int = 60, outCol: String = "phash"): DataFrame = {
    require(cells > 0 && cells <= 63, s"cells must be in [1, 63], got $cells")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          val n = bytes.length
          val step = math.max(1, n / cells)
          val vs = new Array[Int](cells)
          var present = 0
          var sum = 0L
          var i = 0
          while (i < cells) {
            val pos = i * step
            if (pos < n) {
              vs(i) = java.lang.Byte.toUnsignedInt(bytes(pos))
              sum += vs(i); present += 1
            } else vs(i) = -1
            i += 1
          }
          var fp = 0L
          if (present > 0) {
            val mean = sum.toDouble / present
            i = 0
            while (i < cells) {
              if (vs(i) > mean) fp |= 1L << i
              i += 1
            }
          }
          (id, fp)
        }
      }
      .toDF(idCol, outCol)
  }

  /** Feature-extract stage: fixed-size float feature vector per payload
    * (stub: byte histogram folded to `dim` buckets, L1-normalized) —
    * the same batch shape a real embedding model invocation would use.
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Double](dim)
          bytes.foreach(b => hist(java.lang.Byte.toUnsignedInt(b) % dim) += 1.0)
          val total = math.max(1.0, bytes.length.toDouble)
          (id, hist.map(_ / total))
        }
      }
      .toDF(idCol, "features")
  }
}
