package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level timing decomposition of the wave2 composition (the
  * suite's heaviest keys): times each constituent stage in isolation
  * under the bench session config so the optimization target is
  * measured, not guessed. Usage: runMain graft.tools.Wave2Probe [sfDir]
  */
object Wave2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def time(name: String)(fn: => DataFrame): DataFrame = {
      var out: DataFrame = null
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        out = fn
        out.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[w2] $name%-28s min=${ts.min}%6.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      out
    }

    import graft.scale.Dedup
    val docs = graft.EntryShared.T(spark, sfDir, "documents")
    val wave1 = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val novel = time("exact dedupAgainstIndex") {
      Dedup.dedupAgainstIndex(batch, wave1, "doc_id", "text")
    }.localCheckpoint()
    val idx = time("minhashBandIndex(wave1)") {
      Dedup.minhashBandIndex(wave1, "doc_id", "text", k = 3, numHashes = 64, bands = 64)
    }
    val shingles = time("hashedShingleTable(wave1)") {
      Dedup.hashedShingleTable(wave1, "doc_id", "text", k = 3)
    }
    Seq(("capped", Dedup.DefaultMaxBucketSize), ("uncapped", 0)).foreach { case (tag, cap) =>
      time(s"nearDup probe ($tag)") {
        Dedup.nearDupMinhashAgainstIndex(
          novel, idx, shingles, "doc_id", "text",
          k = 3, numHashes = 64, bands = 64, threshold = 0.3, maxBucketSize = cap)
      }
    }
    time("wave2 full (ship cap)") {
      graft.SparkEntry.queries("x_corpus_wave2_ship")(spark, sfDir)
    }
    spark.stop()
  }
}
