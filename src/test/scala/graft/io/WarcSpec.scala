package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** WET (WARC conversion-record) ingestion: render → distributed
  * delimiter-split read → field parse. The roundtrip must be
  * body-identical, Content-Length must be UTF-8 BYTES (not chars), and
  * genuine Common Crawl-shaped files (warcinfo prologue, CRLF headers)
  * must parse field-for-field.
  */
class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("writeWet/readWet roundtrip: body identity, byte-true Content-Length") {
    val rows = Seq(
      (1L, "plain ascii body\nsecond line"),
      (2L, ""),                       // empty body
      (3L, "café 世界"), // multibyte: bytes > chars
      (4L, "trailing newline\n")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("wet_rt").toString
    Sinks.writeWet(rows.select(
      concat(lit("https://ex.org/d/"), col("doc_id")).as("url"),
      lit("2026-01-01T00:00:00Z").as("date"), col("text")), dir)
    val back = Warc.readWet(spark, dir)
      .filter(col("record_type") === "conversion")
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[String]("date"), r.getAs[Long]("content_length"),
          r.getAs[String]("text")))).toMap
    assert(back.size == 4)
    val expected = rows.collect().map(r =>
      s"https://ex.org/d/${r.getLong(0)}" -> r.getString(1)).toMap
    expected.foreach { case (url, text) =>
      val (date, clen, body) = back(url)
      assert(date == "2026-01-01T00:00:00Z")
      assert(body == text, s"body mismatch for $url")
      assert(clen == text.getBytes("UTF-8").length.toLong,
        s"Content-Length must be bytes for $url")
    }
  }

  test("readWet parses a hand-written Common Crawl-shaped WET file") {
    val wet = Seq(
      "WARC/1.0",
      "WARC-Type: warcinfo",
      "WARC-Date: 2026-02-03T04:05:06Z",
      "Content-Type: application/warc-fields",
      "Content-Length: 25",
      "",
      "software: test-generator\n",
      "",
      "WARC/1.0",
      "WARC-Type: conversion",
      "WARC-Target-URI: https://example.com/page?q=1",
      "WARC-Date: 2026-02-03T04:05:07Z",
      "WARC-Record-ID: <urn:uuid:0001>",
      "Content-Type: text/plain",
      "Content-Length: 21",
      "",
      "Extracted text.\nMore.",
      "",
      ""
    ).mkString("\r\n")
    val dir = java.nio.file.Files.createTempDirectory("wet_fix")
    val path = dir.resolve("sample.warc.wet").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), wet)
    val got = Sources.readTable(spark, path) // .wet dispatch
      .collect().map(r => r.getAs[String]("record_type") -> r).toMap
    assert(got.size == 2)
    assert(got("warcinfo").getAs[String]("url") == null)
    val conv = got("conversion")
    assert(conv.getAs[String]("url") == "https://example.com/page?q=1")
    assert(conv.getAs[String]("date") == "2026-02-03T04:05:07Z")
    assert(conv.getAs[String]("record_id") == "<urn:uuid:0001>")
    assert(conv.getAs[Long]("content_length") == 21L)
    assert(conv.getAs[String]("text") == "Extracted text.\nMore.")
  }

  test("writeWet refuses a body containing the record separator") {
    val dir = java.nio.file.Files.createTempDirectory("wet_bad").toString
    val bad = Seq(("u1", "d", "pre\r\n\r\npost")).toDF("url", "date", "text")
    val ex = intercept[Exception] { Sinks.writeWet(bad, dir) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("record separator")))
  }

  test("readWet over a multi-file gzip directory: file-level parallelism, values intact") {
    // Common Crawl's shape: thousands of ~1 GB .gz WET files. Gzip is
    // unsplittable, so the scan's parallelism unit is the FILE; small
    // files bin-pack into tasks by size (maxPartitionBytes /
    // openCostInBytes), large ones get a task each. Evidence for both:
    // default confs pack these 6 tiny files into few tasks; forcing
    // the pack size down to one-file granularity yields exactly one
    // partition per file.
    val dir = java.nio.file.Files.createTempDirectory("wet_multi").toString
    val rows = (0 until 30).map(i =>
      (s"https://ex.com/$i", "2026-01-01T00:00:00Z", s"body text $i\nmore $i"))
      .toDF("url", "date", "text").repartition(6)
    Sinks.writeWet(rows, dir, compression = Some("gzip"))
    val gzFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".gz"))
    assert(gzFiles == 6, s"expected 6 gzip part files, got $gzFiles")

    val conf = spark.conf
    val oldMax = conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = conf.get("spark.sql.files.openCostInBytes")
    try {
      conf.set("spark.sql.files.maxPartitionBytes", "1")
      conf.set("spark.sql.files.openCostInBytes", "1")
      val read = Warc.readWet(spark, dir).filter($"record_type" === "conversion")
      assert(read.rdd.getNumPartitions == 6,
        s"expected one partition per gzip file, got ${read.rdd.getNumPartitions}")
      val texts = read.select("text").collect().map(_.getString(0)).toSet
      assert(texts == (0 until 30).map(i => s"body text $i\nmore $i").toSet)
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }

  test("writeWet refuses a body containing the record header (lineSep fires on EVERY occurrence)") {
    // no \r\n\r\n anywhere: the old separator-only guard passed this
    // body, but readWet's lineSep split still fires mid-body
    val dir = java.nio.file.Files.createTempDirectory("wet_bad2").toString
    val bad = Seq(("u1", "d", "quoted: WARC/1.0\r\nrest")).toDF("url", "date", "text")
    val ex = intercept[Exception] { Sinks.writeWet(bad, dir) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("WARC/1.0")))
  }

  test("readWetStrict ingests adversarial bodies the delimiter reader mis-splits") {
    // bodies containing the record magic AND the record separator —
    // the exact text readWet's lineSep split corrupts
    val rows = Seq(
      (1L, "before\r\nWARC/1.0\r\nafter"),
      (2L, "sep\r\n\r\ninside"),
      (3L, "plain body"),
      (4L, "WARC/1.0\r\n"), // body IS the magic
      (5L, "café 世界\r\nWARC/1.0\r\n tail")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("wet_strict").toString
    Sinks.writeWet(rows.select(
      concat(lit("https://ex.org/d/"), col("doc_id")).as("url"),
      lit("2026-01-01T00:00:00Z").as("date"), col("text")), dir,
      forStrictReader = true)
    val back = Warc.readWetStrict(spark, dir)
      .filter(col("record_type") === "conversion")
      .collect().map(r => r.getAs[String]("url") ->
        ((r.getAs[Long]("content_length"), r.getAs[String]("text")))).toMap
    assert(back.size == 5)
    rows.collect().foreach { r =>
      val (clen, body) = back(s"https://ex.org/d/${r.getLong(0)}")
      assert(body == r.getString(1), s"body mismatch for doc ${r.getLong(0)}")
      assert(clen == r.getString(1).getBytes("UTF-8").length.toLong)
    }
    // and the delimiter reader DOES mis-split this file: more "records"
    // than rows were written (each embedded magic spawns a phantom)
    assert(Warc.readWet(spark, dir).count() > 5)
  }

  test("readWetStrict fails loudly on structural violations, with file+offset") {
    def parse(s: String) = Warc.parseStrict("t.wet", s.getBytes("UTF-8"))
    def rec(body: String, cl: Int = -1): String = {
      val n = if (cl >= 0) cl else body.getBytes("UTF-8").length
      s"WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: $n\r\n\r\n$body\r\n\r\n"
    }
    // well-formed parses exactly
    assert(parse(rec("abc") + rec("def")).map(_.text) == Seq("abc", "def"))
    // extra blank-line padding between records tolerated
    assert(parse(rec("abc") + "\r\n" + rec("def")).map(_.text) == Seq("abc", "def"))
    // overdeclared Content-Length → truncated-body failure
    val e1 = intercept[IllegalArgumentException](parse(rec("abc", cl = 9999)))
    assert(e1.getMessage.contains("truncated") && e1.getMessage.contains("t.wet"))
    // underdeclared Content-Length → terminator lands mid-body
    val e2 = intercept[IllegalArgumentException](parse(rec("abcdef", cl = 2)))
    assert(e2.getMessage.contains("terminator"))
    // missing Content-Length
    val e3 = intercept[IllegalArgumentException](
      parse("WARC/1.0\r\nWARC-Type: conversion\r\n\r\nabc\r\n\r\n"))
    assert(e3.getMessage.contains("Content-Length"))
    // garbage prologue → magic failure with byte offset
    val e4 = intercept[IllegalArgumentException](parse("junk" + rec("abc")))
    assert(e4.getMessage.contains("WARC/1.0") && e4.getMessage.contains("byte 0"))
  }

  test("readWetStrict reads gzip WET: per-file inflate, values intact") {
    val dir = java.nio.file.Files.createTempDirectory("wet_strict_gz")
    val body = "gz body\r\nWARC/1.0\r\n embedded"
    val n = body.getBytes("UTF-8").length
    val recText = s"WARC/1.0\r\nWARC-Type: conversion\r\n" +
      s"WARC-Target-URI: https://ex.org/gz\r\nContent-Length: $n\r\n\r\n$body\r\n\r\n"
    val gz = new java.io.ByteArrayOutputStream()
    val zs = new java.util.zip.GZIPOutputStream(gz)
    zs.write(recText.getBytes("UTF-8")); zs.close()
    java.nio.file.Files.write(dir.resolve("a.warc.wet.gz"), gz.toByteArray)
    val got = Warc.readWetStrict(spark, dir.toString).collect()
    assert(got.length == 1)
    assert(got(0).getAs[String]("text") == body)
    assert(got(0).getAs[String]("url") == "https://ex.org/gz")
  }
}
