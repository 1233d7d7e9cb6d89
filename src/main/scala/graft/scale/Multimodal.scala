package graft.scale

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §7.4): treat image/audio/video
  * payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as a partition-local batch map.
  *
  * Two decode configs share one batch shape:
  *   - the STUB (`FakeDecode` and the byte-subsample stages) — fully
  *     deterministic from payload BYTES, so the `x_mm_*` oracle keys
  *     replay it in DuckDB;
  *   - the REAL image path (`decodeMetaImageIO`, `perceptualHashImage`,
  *     `resizeImage`, `extractFeaturesImage`) on javax.imageio — the
  *     JDK's built-in PNG/BMP/GIF/JPEG codecs, spec-gated on generated
  *     fixture images (MultimodalSpec pins decode meta and the
  *     encoding-invariance of pixel-level features). Audio/video
  *     remain stub-only (no JDK codec).
  * Everything Spark-side is identical between configs: schema, binary
  * column handling, the mapPartitions batch shape (the Scala analogue
  * of `mapInPandas`: one iterator per partition, per-partition codec
  * init, constant memory), and partitioning behavior.
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

  // ------------------------------------------------------------------
  // REAL image decode — javax.imageio (JDK-builtin: PNG/BMP/GIF/JPEG
  // readers ship with the JRE, no external codec, no egress). The same
  // mapPartitions batch shape as the stub stages above, so a pipeline
  // swaps ONE stage to go from replayable-fake to real decode. The
  // stub stays the oracle config (byte-level deterministic across
  // engines); the real stages are spec-gated (MultimodalSpec decodes
  // generated PNG/BMP fixtures and pins encoding-invariance).
  // ------------------------------------------------------------------

  /** Largest pixel count [[decodeImage]] will allocate (64 Mpx ≈ 256 MB
    * of ARGB) — headers claiming more are treated as undecodable before
    * any allocation happens (decompression-bomb guard). Generous for
    * real corpora: 64 Mpx is ~8Kx8K, beyond any training image. */
  private val MaxDecodePixels: Long = 64L * 1024L * 1024L

  /** Decode `bytes` with the first capable ImageIO reader. None for
    * empty/undecodable payloads (kept in-band by callers). */
  private def decodeImage(
      bytes: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] = {
    if (bytes == null || bytes.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val fmt = r.getFormatName.toLowerCase
          // Decompression-bomb guard: a tiny payload whose header
          // declares huge dimensions (e.g. a 100000x100000 PNG) would
          // make r.read(0) allocate the full BufferedImage and OOM the
          // executor — an Error the Exception catch below can't keep
          // in-band. getWidth/getHeight only parse the header, so
          // oversized claims are rejected before any pixel allocation
          // and surface as "undecodable" like any other bad payload.
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h.toLong > MaxDecodePixels) None
          else Option(r.read(0)).map(img => (fmt, img))
        } catch { case _: Exception => None }
        finally r.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** Integer luma (0..255) of an RGB pixel — the BT.601 weights in
    * integer arithmetic (deterministic on every JVM). */
  private def luma(rgb: Int): Int = {
    val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** REAL decode stage: [[decodeMeta]]'s shape with javax.imageio in
    * the partition-local batch. Undecodable payloads surface as format
    * "undecodable" with 0x0 dimensions — in-band, so an audit filter
    * can count/route them instead of the job dying on one bad file.
    * The checksum is the stub's byte-rolling hash (payload identity,
    * not pixel identity — two encodings of one image differ here and
    * agree in [[perceptualHashImage]], which is the point of each).
    */
  def decodeMetaImageIO(
      df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes0) =>
          val bytes = if (bytes0 == null) Array.emptyByteArray else bytes0
          var ck = 1125899906842597L
          var i = 0
          while (i < bytes.length) { ck = ck * 31 + bytes(i); i += 1 }
          decodeImage(bytes) match {
            case Some((fmt, img)) =>
              MediaMeta(id, bytes.length.toLong, fmt, img.getWidth, img.getHeight, ck)
            case None =>
              MediaMeta(id, bytes.length.toLong, "undecodable", 0, 0, ck)
          }
        }
      }
  }

  /** REAL perceptual hash: decode, average integer luma per cell of a
    * `gridW`x`gridH` grid, threshold each cell against the grid mean
    * (strict, like the stub), pack the bits. The property the stub
    * cannot have and image dedup actually needs: two ENCODINGS of the
    * same pixels (PNG vs BMP) hash identically — spec-pinned. Pair
    * with [[Dedup.nearDupByFingerprint]] for the banded Hamming join.
    * Undecodable payloads hash to 0L (in-band).
    */
  def perceptualHashImage(
      df: DataFrame, idCol: String, payloadCol: String,
      gridW: Int = 8, gridH: Int = 7, outCol: String = "phash"): DataFrame = {
    require(gridW > 0 && gridH > 0 && gridW * gridH <= 63,
      s"grid must fit a signed long: got ${gridW}x$gridH")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val fp = decodeImage(bytes) match {
            case None => 0L
            case Some((_, img)) =>
              val w = img.getWidth; val h = img.getHeight
              val cells = gridW * gridH
              val means = new Array[Double](cells)
              var total = 0.0
              var cy = 0
              while (cy < gridH) {
                var cx = 0
                while (cx < gridW) {
                  val x0 = cx * w / gridW; val x1 = math.max(x0 + 1, (cx + 1) * w / gridW)
                  val y0 = cy * h / gridH; val y1 = math.max(y0 + 1, (cy + 1) * h / gridH)
                  var s = 0L; var c = 0
                  var y = y0
                  while (y < y1 && y < h) {
                    var x = x0
                    while (x < x1 && x < w) { s += luma(img.getRGB(x, y)); c += 1; x += 1 }
                    y += 1
                  }
                  val m = if (c > 0) s.toDouble / c else 0.0
                  means(cy * gridW + cx) = m
                  total += m
                  cx += 1
                }
                cy += 1
              }
              val mean = total / cells
              var out = 0L
              var i = 0
              while (i < cells) { if (means(i) > mean) out |= 1L << i; i += 1 }
              out
          }
          (id, fp)
        }
      }
      .toDF(idCol, outCol)
  }

  /** REAL resize: decode, nearest-neighbor resample (a deterministic
    * integer map — `src(x·w div W, y·h div H)` — rather than AWT's
    * platform-tuned rendering pipeline), re-encode as PNG (lossless;
    * the spec pins pixel equality through the roundtrip, not byte
    * equality — PNG compressors may differ across JVMs). Undecodable
    * payloads pass through as empty output payloads with 0x0 declared
    * dimensions.
    */
  def resizeImage(
      df: DataFrame, idCol: String, payloadCol: String,
      targetW: Int = 256, targetH: Int = 256): DataFrame = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeImage(bytes) match {
            case None => (id, 0, 0, Array.emptyByteArray)
            case Some((_, img)) =>
              val w = img.getWidth; val h = img.getHeight
              val out = new java.awt.image.BufferedImage(
                targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < targetH) {
                var x = 0
                while (x < targetW) {
                  out.setRGB(x, y, img.getRGB(x * w / targetW, y * h / targetH))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              (id, targetW, targetH, bos.toByteArray)
          }
        }
      }
      .toDF(idCol, "width", "height", "payload")
  }

  /** REAL feature vector: L1-normalized luma histogram over all pixels
    * folded to `dim` buckets (`luma · dim div 256`) — encoding-
    * invariant like [[perceptualHashImage]]. Undecodable → zero
    * vector.
    */
  def extractFeaturesImage(
      df: DataFrame, idCol: String, payloadCol: String, dim: Int = 16): DataFrame = {
    require(dim > 0, "dim must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Cleaning.qcol(idCol).cast("long"), graft.ops.Cleaning.qcol(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val hist = new Array[Double](dim)
          decodeImage(bytes).foreach { case (_, img) =>
            val w = img.getWidth; val h = img.getHeight
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { hist(luma(img.getRGB(x, y)) * dim / 256) += 1.0; x += 1 }
              y += 1
            }
            val total = math.max(1.0, (w.toLong * h).toDouble)
            var i = 0
            while (i < dim) { hist(i) /= total; i += 1 }
          }
          (id, hist)
        }
      }
      .toDF(idCol, "features")
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
