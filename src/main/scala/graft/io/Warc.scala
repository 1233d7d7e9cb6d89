package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET ingestion — the format pretraining corpora actually arrive
  * in (Common Crawl's WET "conversion" records: extracted plain text,
  * one record per page). WARC is ISO 28500; a WET record is
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: conversion\r\n
  * WARC-Target-URI: <url>\r\n
  * WARC-Date: <iso8601>\r\n
  * WARC-Record-ID: <urn:uuid:...>\r\n
  * Content-Type: text/plain\r\n
  * Content-Length: <bytes>\r\n
  * \r\n
  * <body>\r\n
  * \r\n
  * }}}
  *
  * Spark-first shape: `spark.read.option("lineSep", "WARC/1.0\r\n")
  * .text(...)` makes the RECORD the row — the split happens in the
  * distributed text reader (splittable on uncompressed input; one task
  * per file on .gz, which matches Common Crawl's shape: thousands of
  * ~1 GB gzip WET files → file-level parallelism). Header fields and
  * the body then come out of narrow codegen'd expressions — no
  * mapPartitions, no custom InputFormat, no driver involvement.
  *
  * Limitation (inherent to any delimiter-split reader): the split
  * fires on EVERY occurrence of `WARC/1.0\r\n`, so a body containing
  * that sequence ANYWHERE — no preceding `\r\n\r\n` required — splits
  * early into corrupt records. WET bodies are extracted text with `\n`
  * newlines, where no `\r\n` sequence can occur; [[Sinks.writeWet]]
  * refuses (in-plan) to write a body containing `WARC/1.0\r\n` or the
  * record separator `\r\n\r\n`.
  */
object Warc {

  /** Matches header lines like `Name: value` (value = rest of line;
    * `.` excludes line terminators and `$` sits BEFORE the `\r\n`, so
    * the CR never leaks into the capture). */
  private def header(rec: Column, name: String): Column = {
    val m = regexp_extract(rec, "(?m)^" + name + ": (.*)$", 1)
    when(m === "", lit(null).cast("string")).otherwise(m)
  }

  /** One parsed WET record ([[readWetStrict]]'s row type; the column
    * set matches [[readWet]]). */
  case class WetRecord(
      record_type: String, url: String, date: String, record_id: String,
      content_length: Long, text: String)

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val limit = hay.length - needle.length
    while (i <= limit) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Magic = "WARC/1.0\r\n".getBytes(Utf8)
  private val BlankLine = "\r\n\r\n".getBytes(Utf8)

  private def headerOf(block: String, name: String): String = {
    val m = (("(?m)^" + name + ": (.*)$").r).findFirstMatchIn(block)
    m.map(_.group(1)).orNull
  }

  /** Content-Length-honoring per-file record parse: walk the byte
    * stream record by record, slicing each body to EXACTLY its declared
    * Content-Length — an embedded `WARC/1.0\r\n` inside a body is body
    * bytes, never a record boundary. Fails loudly (file + byte offset)
    * on any structural violation: missing magic, unterminated header
    * block, absent/malformed Content-Length, truncated body, or a
    * missing record terminator — a mis-framed crawl file must never
    * silently yield shifted records.
    */
  private[io] def parseStrict(path: String, bytes: Array[Byte]): Seq[WetRecord] = {
    def fail(pos: Int, why: String): Nothing =
      throw new IllegalArgumentException(
        s"readWetStrict: $why at byte $pos of $path")
    val out = scala.collection.mutable.ArrayBuffer.empty[WetRecord]
    var pos = 0
    while (pos < bytes.length) {
      if (indexOf(bytes, Magic, pos) != pos || pos + Magic.length > bytes.length)
        fail(pos, "expected record to start with WARC/1.0\\r\\n")
      val hdrStart = pos + Magic.length
      val hdrEnd = indexOf(bytes, BlankLine, hdrStart)
      if (hdrEnd < 0) fail(hdrStart, "unterminated header block (no \\r\\n\\r\\n)")
      val headers = new String(bytes, hdrStart, hdrEnd - hdrStart, Utf8)
      val clStr = headerOf(headers, "Content-Length")
      val cl = try {
        if (clStr == null) fail(hdrStart, "record has no Content-Length header")
        clStr.trim.toLong
      } catch { case _: NumberFormatException =>
        fail(hdrStart, s"malformed Content-Length '$clStr'") }
      val bodyStart = hdrEnd + BlankLine.length
      if (bodyStart + cl > bytes.length)
        fail(bodyStart, s"body truncated: Content-Length $cl overruns the file")
      val body = new String(bytes, bodyStart, cl.toInt, Utf8)
      var next = bodyStart + cl.toInt
      if (indexOf(bytes, BlankLine, next) != next)
        fail(next, "missing record terminator \\r\\n\\r\\n after body")
      next += BlankLine.length
      // tolerate extra blank-line padding between records (some tools
      // emit more than one terminator pair); structure is re-validated
      // at the next record's magic either way
      while (next + 1 < bytes.length && bytes(next) == '\r' && bytes(next + 1) == '\n')
        next += 2
      out += WetRecord(
        headerOf(headers, "WARC-Type"),
        headerOf(headers, "WARC-Target-URI"),
        headerOf(headers, "WARC-Date"),
        headerOf(headers, "WARC-Record-ID"),
        cl, body)
      pos = next
    }
    out.toSeq
  }

  private def gunzip(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    try in.readAllBytes() finally in.close()
  }

  /** STRICT WET/WARC reader — honors each record's `Content-Length`
    * instead of delimiter-splitting, so it ingests ADVERSARIAL crawl
    * data correctly: a body containing `WARC/1.0\r\n` (which mis-splits
    * [[readWet]] — see the limitation note above) is sliced as body
    * bytes because the parser jumps exactly `Content-Length` bytes past
    * the header block. Structural violations fail loudly with file +
    * offset rather than yielding shifted records.
    *
    * Scale shape: `binaryFile` source → one task per file → a strictly
    * sequential in-memory parse per file (Content-Length framing is
    * inherently sequential — each record's start depends on the
    * previous record's declared length, so an intra-file split point
    * cannot be found without parsing; this is the same per-file
    * parallelism .gz WET already forces on the delimiter reader, and
    * Common Crawl's thousands-of-~1GB-files layout makes file-level
    * parallelism the real axis). `.gz` files are inflated in-task.
    * Prefer [[readWet]] for trusted `\n`-bodied WET at maximum scan
    * throughput; use this for crawl data you did not write.
    */
  def readWetStrict(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, raw) =>
        parseStrict(p, if (p.endsWith(".gz")) gunzip(raw) else raw)
      }
      .select(col("record_type"), col("url"), col("date"),
        col("record_id"), col("content_length"), col("text"))
  }

  /** Read a WET/WARC file (or directory/glob) into
    * (record_type, url, date, record_id, content_length, text).
    * Every record type is surfaced (warcinfo prologues included, with
    * null url) — filter `record_type = 'conversion'` for page text.
    */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    val recs = spark.read.option("lineSep", "WARC/1.0\r\n").text(path)
      .filter(col("value") =!= "")
    // headers end at the first blank line; the body then runs to the
    // record-terminating \r\n\r\n (stripped below). locate() is 1-based.
    val sep = locate("\r\n\r\n", col("value"))
    val headers = substring(col("value"), lit(1), sep - 1)
    val rawBody = col("value").substr(sep + lit(4), length(col("value")))
    val body = when(length(rawBody) >= 4,
        rawBody.substr(lit(1), length(rawBody) - 4))
      .otherwise(lit(""))
    recs.select(
      header(headers, "WARC-Type").as("record_type"),
      header(headers, "WARC-Target-URI").as("url"),
      header(headers, "WARC-Date").as("date"),
      header(headers, "WARC-Record-ID").as("record_id"),
      header(headers, "Content-Length").cast("long").as("content_length"),
      body.as("text"))
  }
}
