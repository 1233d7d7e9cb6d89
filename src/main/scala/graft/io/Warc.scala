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
