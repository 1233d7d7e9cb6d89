package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import graft.SparkTestSession

/** Physical-plan guards for the scale contracts SCALE.md documents —
  * regressions that stay correct at test SF but die at 100 TB (a
  * global-order window funneling the table through one task, a percent
  * denominator as an empty-frame window) are caught here, not by the
  * value oracles.
  */
class ScalePlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] =
    (p +: p.children.flatMap(collectPlans)) ++ p.subqueries.flatMap(collectPlans)

  /** A WindowExec with an empty partitionSpec funnels ALL rows through
    * one task — the canonical scale-killer. */
  private def unpartitionedWindows(df: DataFrame): Seq[WindowExec] =
    collectPlans(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  private def orders = Seq(
    (1L, 101.0), (2L, 250.0), (3L, 75.5), (4L, 600.0), (5L, 42.0),
    (6L, 101.0), (7L, 88.0), (8L, 910.0), (9L, 33.3), (10L, 77.0),
    (11L, 120.0), (12L, 305.0)
  ).toDF("o_orderkey", "o_totalprice")

  test("bucketSummary (b4_deciles) has no unpartitioned window") {
    val o = orders.withColumn("cents",
      org.apache.spark.sql.functions.floor(
        org.apache.spark.sql.functions.col("o_totalprice") * 100 + 0.5).cast("long"))
    val plan = Stats.bucketSummary(o, "cents", nBuckets = 4)
    assert(unpartitionedWindows(plan).isEmpty,
      "bucketSummary must assign buckets by boundary comparison, not a global window")
    // and it still buckets correctly: 12 rows over 4 buckets
    val rows = plan.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.values.sum == 12)
    assert(rows.keys.min >= 1 && rows.keys.max <= 4)
  }

  test("percent denominators are broadcast 1-row aggs, not empty-frame windows") {
    val freq = Tabulation.freqTable(orders.withColumn("g",
      org.apache.spark.sql.functions.col("o_orderkey") % 3), "g", None, 1)
    assert(unpartitionedWindows(freq).isEmpty)
  }

  test("packSequences' running sum is partitioned by shard, never global") {
    val docs = (0L until 40L).map(i => (i, "a b c d e")).toSeq.toDF("doc_id", "text")
    val plan = graft.scale.TextAnalysis.packSequences(docs, "doc_id", "text", 100, 4)
    assert(unpartitionedWindows(plan).isEmpty,
      "packing must cumsum within shards (the global-ntile trap)")
  }

  test("weightedQuantile windows are partitioned by the group key") {
    val df = orders.withColumn("g", org.apache.spark.sql.functions.col("o_orderkey") % 2)
      .withColumn("w", org.apache.spark.sql.functions.lit(1.0))
    val q = Stats.weightedQuantile(df, "o_totalprice", "w", Seq("g"), 0.5)
    assert(unpartitionedWindows(q).isEmpty)
  }
}
