package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: times Dedup.clusters at different checkEvery values
  * on the sf0.1 documents near-dup graph. Not part of the library
  * surface; used to pick the convergence-check cadence with data.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")
    val pairs = graft.scale.Dedup.nearDupNgram(docs, "doc_id", "text", k = 3, threshold = 0.2)
      .persist()
    println(s"[ccprobe] pairs=${pairs.count()}")
    for (ce <- Seq(1, 2, 3); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.scale.Dedup.clusters(docs, "doc_id", pairs, maxIter = 20, checkEvery = ce).count()
      println(f"[ccprobe] checkEvery=$ce rep=$rep rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
