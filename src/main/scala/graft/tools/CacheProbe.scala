package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe for the r4 cache-lifecycle work: runs each operator
  * that formerly leaked persisted frames, then reports (a) whether the
  * capped LSH self-joins reuse their exchange (so dropping the r3
  * persist costs no recompute) and (b) how many entries remain in the
  * cache manager after each operator completes — must be ZERO.
  * Not part of the library surface.
  */
object CacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.io.Sources.table(spark, sfDir, "documents")

    def cachedEntries: Long =
      spark.sharedState.cacheManager.isEmpty match {
        case true => 0L
        case false => -1L // non-empty; exact count not exposed
      }
    def check(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[cacheprobe] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s cacheEmptyAfter=${cachedEntries == 0}")
    }

    // (a) exchange reuse on the capped paths (post-execution: AQE marks
    // reuse only once stages materialize). At test SF the self-join
    // sides fit under the broadcast threshold (BroadcastExchange ≠
    // shuffle Exchange — no reuse, signatures computed per side); the
    // 100 TB shape is SortMergeJoin over two IDENTICAL shuffle
    // exchanges, which ReuseExchange must collapse into one — assert
    // that shape with broadcast disabled.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val mh = graft.scale.Dedup.nearDupMinhash(docs, "doc_id", "text",
      bands = 16, threshold = 0.7, maxBucketSize = 1000)
    mh.collect() // materialize THIS query execution so AQE finalizes it
    val mhPlan = mh.queryExecution.executedPlan.toString
    println(s"[cacheprobe] minhash capped plan has reuse=${mhPlan.contains("ReusedExchange") || mhPlan.contains("TableCacheQueryStage") || mhPlan.contains("reused")}")
    val ng = graft.scale.Dedup.nearDupNgram(docs, "doc_id", "text",
      k = 3, threshold = 0.2, maxBlockSize = 4096)
    ng.collect()
    val ngPlan = ng.queryExecution.executedPlan.toString
    println(s"[cacheprobe] ngram capped plan has reuse=${ngPlan.contains("ReusedExchange") || ngPlan.contains("reused")}")
    if (args.contains("--dump")) println(mhPlan)

    // (b) zero residue after each formerly-leaking operator
    check("nearDupMinhash(capped)")(mh.count())
    check("nearDupNgram(capped)")(ng.count())
    check("crossDocNgramStats")(
      graft.scale.Dedup.crossDocNgramStats(docs, "doc_id", "text", k = 8).count())
    check("clusters")(
      graft.scale.Dedup.clusters(docs, "doc_id", ng).count())
    check("cleanCorpus")(
      graft.scale.TextAnalysis.cleanCorpus(docs, "doc_id", "text",
        allowedLangs = Seq("en", "es")).count())
    check("deduplicate")(
      graft.scale.Dedup.deduplicate(docs, "doc_id", "text").count())
    check("freqTable")(
      graft.ops.Tabulation.freqTable(docs, "lang", None).count())
    spark.stop()
  }
}
