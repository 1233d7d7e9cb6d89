package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage breakdown of the x_dedup_minhash oracle config
  * (bands = numHashes = 64) at sf0.1 — identifies which stage of the
  * candidate pipeline carries the cost. Diagnostic main, not part of
  * the library surface.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.io.Sources.table(spark, sfDir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[mh] $label%-28s rows=$n%9d time=${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // warm
    docs.count()
    time("docs scan")(docs.count())
    val sigs = graft.scale.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64)
    time("signatures")(sigs.count())
    val toks = graft.scale.TextAnalysis.tokens(col("text"))
    val sets = docs.select(col("doc_id"),
      graft.functions.Native.hashedShingleSet(toks, 3).as("shingles"))
    time("shingle sets")(sets.count())
    // decompose the candidate pipeline (reuses `sigs` — the per-stage
    // timings below still include recomputing the lazy signature plan,
    // which is itself ~0.2s per the stage above)
    val bandStructs = (0 until 64).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b + 1, 1)).as("bucket"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    time("buckets explode")(buckets.count())
    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    val cands = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
    time("bucket self-join")(cands.count())
    val dist = cands.select("id_a", "id_b").distinct()
    time("distinct pairs")(dist.count())
    val pairs = graft.scale.Dedup.nearDupMinhash(docs, "doc_id", "text",
      k = 3, numHashes = 64, bands = 64, threshold = 0.3)
    time("full nearDupMinhash")(pairs.count())
    time("full nearDupMinhash again")(pairs.count())
    spark.stop()
  }
}
