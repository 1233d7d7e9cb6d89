package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources (SURVEY.md §2.1 S1–S4).
  *
  * S1 CSV (app.py:74-81): header + schema inference, matching pandas
  * read_csv's inference envelope (long/double/string).
  * S3 codebook CSV (app.py:218-227): contract `column,value,label`,
  * collapsed to per-column recode maps. The codebook is survey-sized
  * config data; collecting it to the driver (then broadcasting inside
  * `typedLit` maps) is the scale-correct shape — the 100 TB side stays
  * distributed.
  * S2 Excel: `Excel.read` — a minimal self-contained xlsx reader (an
  * xlsx is a zip of XML; no POI needed); `Xls.read` — a minimal BIFF8
  * reader for legacy `.xls` (app.py:78-79 accepts it). Parquet remains
  * the at-scale contract.
  */
object Sources {

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSONL / NDJSON (one JSON object per line) — the lingua franca of
    * training-data corpora. Schema inferred; splittable and fully
    * distributed (each executor reads its own line ranges).
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC — the other columnar interchange format big warehouses emit
    * (Hive/Trino exports). Vectorized reader, predicate pushdown and
    * column pruning like parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Extension-dispatching reader (read_table, app.py:74-81; jsonl is a
    * beyond-reference addition). */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".csv")) readCsv(spark, path)
    else if (lower.endsWith(".parquet")) readParquet(spark, path)
    else if (lower.endsWith(".jsonl") || lower.endsWith(".ndjson")) readJsonl(spark, path)
    else if (lower.endsWith(".orc")) readOrc(spark, path)
    else if (lower.endsWith(".xlsx")) Excel.read(spark, path)
    else if (lower.endsWith(".xls")) Xls.read(spark, path)
    else if (lower.endsWith(".wet") || lower.endsWith(".wet.gz") ||
      lower.endsWith(".warc") || lower.endsWith(".warc.gz"))
      Warc.readWet(spark, path)
    else throw new IllegalArgumentException(s"Unsupported file type: $path")
  }

  /** Convenience: read a named testdata table from an sf directory.
    * Normalizes the events `ts` column to a session-TZ TIMESTAMP
    * whatever the writer's physical type was:
    *   - TIMESTAMP(NANOS) (which Spark's reader rejects natively):
    *     with `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces
    *     as LongType nanos → truncating-divided to microseconds (same
    *     as DuckDB's ns→us handling);
    *   - `timestamp[us]` with no timezone (pandas/pyarrow default) →
    *     TIMESTAMP_NTZ, cast to TIMESTAMP; sessions here run in UTC,
    *     so wall values — and every unix_* extraction downstream —
    *     equal the oracle engine's naive reading of the same file.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = readParquet(spark, s"$sfDir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ→TIMESTAMP cast interprets the wall clock in the
        // SESSION time zone: in any non-UTC session the values would
        // silently shift relative to an oracle engine's naive reading
        // of the same file — refuse rather than shift (every entrypoint
        // here pins UTC; a library caller must do the same or read the
        // NTZ column directly)
        require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
          "Sources.table(events): session time zone must be UTC — the " +
            "TIMESTAMP_NTZ ts column is interpreted in the session zone " +
            s"(got '${spark.conf.get("spark.sql.session.timeZone")}')")
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** S3 — codebook reader: CSV (or parquet) with columns
    * column,value,label → per-column recode maps (app.py:218-227).
    * Values and labels are stringified exactly like the reference
    * (`astype(str)` on both, app.py:222).
    */
  def readCodebook(spark: SparkSession, path: String): Map[String, Map[String, String]] = {
    val df = readTable(spark, path)
    val required = Set("column", "value", "label")
    require(required.subsetOf(df.columns.map(_.toLowerCase).toSet),
      s"Codebook must have columns: column,value,label (got ${df.columns.mkString(",")})")
    df.select(
        col("column").cast("string"),
        col("value").cast("string"),
        col("label").cast("string"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (c, rows) =>
        c -> rows.map(r => r.getString(1) -> r.getString(2)).toMap
      }
  }
}
