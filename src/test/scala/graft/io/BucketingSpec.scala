package graft.io

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import graft.SparkTestSession

/** The bucketed-ingest contract: tables written with `writeBucketed` on
  * the same key and bucket count join and aggregate WITHOUT a shuffle.
  * This is plan-level scale evidence (SCALE.md §7) — at 100 TB the
  * per-query shuffle this removes is the dominant cost of a fact-table
  * join pipeline.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(collectPlans)) ++ p.subqueries.flatMap(collectPlans)

  private def shuffles(p: SparkPlan): Seq[SparkPlan] =
    collectPlans(p).filter(_.isInstanceOf[ShuffleExchangeLike])

  test("same-bucket join is shuffle-free; unbucketed join is not") {
    val left = (0L until 500L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (0L until 500L).map(i => (i % 250, s"r$i")).toDF("k", "rv")
    Sinks.writeBucketed(left, "bkt_left", 4, Seq("k"), Seq("k"))
    Sinks.writeBucketed(right, "bkt_right", 4, Seq("k"), Seq("k"))
    // force the sort-merge path: a broadcast join would hide the
    // bucketing evidence (and AQE would re-plan it)
    val conf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val bucketed = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(shuffles(bucketed.queryExecution.executedPlan).isEmpty,
        "bucketed join must reuse the write-time hash partitioning")
      assert(bucketed.count() == 500L) // 250 right keys x 2 rows each

      // control: the same join over plain (unbucketed) frames shuffles
      val plain = left.join(right, "k")
      assert(shuffles(plain.queryExecution.executedPlan).nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("aggregation on the bucket key is shuffle-free") {
    val df = (0L until 300L).map(i => (i % 30, i)).toDF("k", "v")
    Sinks.writeBucketed(df, "bkt_agg", 4, Seq("k"))
    val conf = "spark.sql.adaptive.enabled"
    val saved = spark.conf.getOption(conf)
    try {
      spark.conf.set(conf, "false")
      val agg = spark.table("bkt_agg").groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("v").as("s"))
      assert(shuffles(agg.queryExecution.executedPlan).isEmpty,
        "group-by on the bucket key must aggregate within scan partitions")
      assert(agg.count() == 30L)
    } finally saved match {
      case Some(v) => spark.conf.set(conf, v)
      case None => spark.conf.unset(conf)
    }
  }
}
