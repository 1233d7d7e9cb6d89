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
}
