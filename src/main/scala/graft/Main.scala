package graft

import org.apache.spark.sql.SparkSession
import graft.config.{AutoDetect, MappingConfig}
import graft.io.{Sinks, Sources}
import graft.pipeline.Transform

/** CLI driver over the declarative mapping config — the engine's
  * application face (replaces the reference's Streamlit flow, SURVEY §3):
  * read → optional codebook recode → transform → export.
  *
  * Usage:
  *   runMain graft.Main --input wave1.csv [--config mapping.json]
  *     [--codebook codebook.csv] [--out outDir] [--format parquet|csv|json|xlsx]
  *     [--save-config detected.json]
  *
  * Without --config, the mapping is auto-detected from headers
  * (guess_mapping heuristics) and can be persisted with --save-config
  * for reuse on the next wave.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") =>
      k.drop(2) -> v
    }.toMap
    val input = opts.getOrElse("input",
      sys.error("--input <file.csv|.xlsx|.parquet> is required"))
    val outDir = opts.getOrElse("out", "graft_out")
    val format = opts.getOrElse("format", "parquet")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val raw = Sources.readTable(spark, input)
    val cfg = opts.get("config").map(MappingConfig.load)
      .getOrElse(AutoDetect.guessMapping(raw))
    opts.get("save-config").foreach { p =>
      MappingConfig.save(cfg, p)
      println(s"[graft] mapping config written to $p")
    }
    val drift = MappingConfig.validate(cfg, raw)
    if (drift.nonEmpty)
      System.err.println(
        s"[graft] WARNING: config references columns missing from this wave " +
          s"(builders will skip them): ${drift.map { case (s, c) => s"$s=$c" }.mkString(", ")}")

    val codebook = opts.get("codebook")
      .map(Sources.readCodebook(spark, _)).getOrElse(Map.empty)

    val tables = Transform.run(raw, cfg, codebook)
    format match {
      case "parquet" => Sinks.writeParquet(tables, outDir)
      case "csv" => Sinks.writeCsv(tables, outDir)
      case "json" =>
        new java.io.File(outDir).mkdirs()
        Sinks.writeJsonBundle(tables, s"$outDir/bht_dashboard_ready.json")
      case "xlsx" =>
        new java.io.File(outDir).mkdirs()
        Sinks.writeExcel(tables, s"$outDir/bht_dashboard_ready.xlsx")
      case other => sys.error(s"unknown --format $other (parquet|csv|json|xlsx)")
    }
    println(s"[graft] ${tables.size} tables -> $outDir (${tables.keys.toSeq.sorted.mkString(", ")})")
    spark.stop()
  }
}
