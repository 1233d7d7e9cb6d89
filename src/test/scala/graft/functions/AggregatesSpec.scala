package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AggregatesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows = Seq(
    ("a", 1L, 10L), ("a", 2L, 30L), ("a", 3L, 20L), ("a", 4L, 30L), ("a", 5L, 5L),
    ("b", 9L, 7L)
  ).toDF("g", "v", "w")

  test("bounded top-k matches the window form exactly, incl. the tiebreak") {
    val got = rows.groupBy("g")
      .agg(Aggregates.topKByWeight(col("v"), col("w"), 3).as("top"))
      .select(col("g"), explode(col("top")).as("t"))
      .select(col("g"), col("t.value"), col("t.weight"))
      .as[(String, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(desc("w"), asc("v"))
    val oracle = rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("g", "v", "w").as[(String, Long, Long)].collect().toSet
    assert(got == oracle)
    // ties on weight break by min value: (2,30) before (4,30)
    assert(got == Set(("a", 2L, 30L), ("a", 4L, 30L), ("a", 3L, 20L), ("b", 9L, 7L)))
  }

  test("result is ordered (weight desc, value asc) and partitioning-invariant") {
    val big = (0L until 10000L).map(i => (i % 7, i, (i * 2654435761L) % 1000L))
      .toDF("g", "v", "w")
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
      .agg(Aggregates.topKByWeight(col("v"), col("w"), 5).as("top"))
      .select(col("g"), col("top")).as[(Long, Seq[(Long, Long)])]
      .collect().toMap
    val a = run(big)
    val b = run(big.repartition(13))
    assert(a == b)
    a.values.foreach { top =>
      assert(top.length == 5)
      assert(top.sliding(2).forall { case Seq(x, y) =>
        x._2 > y._2 || (x._2 == y._2 && x._1 < y._1) })
    }
  }

  test("nulls are skipped; groups smaller than k return all rows") {
    val df = Seq(
      ("g", Some(1L), Some(10L)), ("g", None, Some(99L)), ("g", Some(2L), None)
    ).toDF("g", "v", "w")
    val got = df.groupBy("g")
      .agg(Aggregates.topKByWeight(col("v"), col("w"), 5).as("top"))
      .select(explode(col("top")).as("t")).select("t.value", "t.weight")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L)))
  }

  test("double-weight top-k: both directions match the window form, partitioning-invariant") {
    val big = (0L until 10000L).map(i =>
      (i % 7, i, ((i * 2654435761L) % 1000L) / 8.0)).toDF("g", "v", "w")
    for (ascending <- Seq(true, false)) {
      def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("g")
        .agg(Aggregates.topKByDoubleWeight(col("v"), col("w"), 5, ascending).as("top"))
        .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("g"), col("pos"), col("t.value"), col("t.weight"))
        .as[(Long, Int, Long, Double)].collect().toSet
      val a = run(big)
      assert(a == run(big.repartition(13)), s"ascending=$ascending not partitioning-invariant")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
        .orderBy(if (ascending) asc("w") else desc("w"), asc("v"))
      val oracle = big.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("g"), (col("rn") - 1).cast("int"), col("v"), col("w"))
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(a == oracle, s"ascending=$ascending diverged from the window oracle")
    }
  }

  test("double-weight top-k: ties break on value asc; null weights skipped") {
    val df = Seq(
      ("g", 4L, Some(1.5)), ("g", 2L, Some(1.5)), ("g", 9L, None), ("g", 1L, Some(9.0))
    ).toDF("g", "v", "w")
    val got = df.groupBy("g")
      .agg(Aggregates.topKByDoubleWeight(col("v"), col("w"), 2, ascending = true).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.value"), col("t.weight")).as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 1.5), (4L, 1.5)))
  }

  test("weighted quantile sketch: exact under capacity, matches the sort definition") {
    // 60 distinct values, integer weights — capacity 4096 → exact mode
    val df = (0L until 6000L).map(i => (i % 3, i % 60, 1L + i % 7)).toDF("g", "v", "w")
    val got = df.groupBy("g")
      .agg(Aggregates.weightedQuantileSketch(col("v"), col("w"), 0.5).as("med"))
      .as[(Long, Long)].collect().toMap
    // brute-force lower weighted median per group
    val rows = df.as[(Long, Long, Long)].collect()
    val expect = rows.groupBy(_._1).map { case (g, rs) =>
      val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val total = byV.map(_._2).sum
      var cum = 0L
      g -> byV.collectFirst { case (v, w) if { cum += w; cum.toDouble >= 0.5 * total } => v }.get
    }
    assert(got == expect)
  }

  test("weighted quantile sketch: over capacity the error is bounded by the stride") {
    // 100k distinct values, capacity 128 → stride = 1024 (2^10 covers 100k/128)
    val df = (0L until 100000L).map(i => (i, 1L)).toDF("v", "w")
    val got = df.agg(Aggregates.weightedQuantileSketch(col("v"), col("w"), 0.5, capacity = 128))
      .as[Long].head()
    val exact = 50000L
    val stride = 1024L
    assert(math.abs(got - exact) <= stride, s"got $got, exact $exact")
    // order/partitioning invariance of the collapsed sketch
    val again = df.repartition(17)
      .agg(Aggregates.weightedQuantileSketch(col("v"), col("w"), 0.5, capacity = 128))
      .as[Long].head()
    assert(got == again)
  }

  test("weighted quantile sketch: empty input is null, negatives bucket correctly") {
    val empty = Seq.empty[(Long, Long)].toDF("v", "w")
    assert(empty.agg(Aggregates.weightedQuantileSketch(col("v"), col("w"), 0.5))
      .collect().head.isNullAt(0))
    val neg = Seq((-10L, 1L), (-5L, 1L), (0L, 1L), (5L, 1L)).toDF("v", "w")
    val q0 = neg.agg(Aggregates.weightedQuantileSketch(col("v"), col("w"), 0.0))
      .as[Long].head()
    assert(q0 == -10L)
  }

  test("heavy hitters: exact and invariant when capacity covers the distinct values") {
    // zipf-ish: value v appears 1000/v times
    val data = (1L to 50L).flatMap(v => Seq.fill((1000 / v).toInt)(v))
    val df = scala.util.Random.shuffle(data).toDF("v")
    val got = df.agg(Aggregates.heavyHitters(col("v"), outputK = 5, capacity = 64))
      .as[Seq[(Long, Long, Long)]].head()
    assert(got == Seq((1L, 1000L, 0L), (2L, 500L, 0L), (3L, 333L, 0L), (4L, 250L, 0L), (5L, 200L, 0L)))
    val again = df.repartition(13)
      .agg(Aggregates.heavyHitters(col("v"), 5, 64)).as[Seq[(Long, Long, Long)]].head()
    assert(got == again) // no eviction => order/partitioning-invariant
  }

  test("heavy hitters: Space-Saving guarantees hold past capacity") {
    // 10 hot values (10k each) + 100k rare singletons, capacity 256
    val hot = (1L to 10L).flatMap(v => Seq.fill(10000)(v))
    val rare = (1000L until 101000L)
    val df = (hot ++ rare).toDF("v").repartition(7)
    val got = df.agg(Aggregates.heavyHitters(col("v"), outputK = 10, capacity = 256))
      .as[Seq[(Long, Long, Long)]].head()
    // every value with true count > N/capacity (~780) must be reported
    assert(got.map(_._1).toSet == (1L to 10L).toSet)
    got.foreach { case (v, c, e) =>
      assert(c >= 10000L, s"reported count below true for $v")     // count >= true
      assert(c - e <= 10000L, s"count-error above true for $v")    // count-error <= true
    }
  }

  test("non-BIGINT inputs are rejected at analysis time with a clear message") {
    val df = Seq(("g", 1, 2.5)).toDF("g", "v", "w") // int value, double weight
    val e = intercept[Exception] {
      df.groupBy("g").agg(Aggregates.topKByWeight(col("v"), col("w"), 2)).collect()
    }
    assert(e.getMessage.contains("BIGINT") || e.getMessage.contains("cast"), e.getMessage)
    val e2 = intercept[Exception] {
      df.groupBy("g").agg(Aggregates.weightedQuantileSketch(col("w"), col("v"), 0.5)).collect()
    }
    assert(e2.getMessage.contains("BIGINT") || e2.getMessage.contains("cast"), e2.getMessage)
  }

  test("bounded top-k aggregates a STREAM (state-store serialize across batches)") {
    implicit val sc = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long, Long)]
    val q = mem.toDF().toDF("g", "v", "w").groupBy("g")
      .agg(Aggregates.topKByWeight(col("v"), col("w"), 2).as("top"))
      .writeStream.outputMode("complete").format("memory").queryName("topkout").start()
    try {
      mem.addData(("a", 1L, 10L), ("a", 2L, 30L))
      q.processAllAvailable()
      mem.addData(("a", 3L, 20L), ("a", 4L, 40L)) // batch 2 must merge with batch-1 state
      q.processAllAvailable()
      val top = spark.table("topkout").select(col("top"))
        .as[Seq[(Long, Long)]].head()
      assert(top == Seq((4L, 40L), (2L, 30L)))
    } finally q.stop()
  }

  test("partial aggregation bounds the shuffle: plan has a partial_bounded_top_k") {
    val plan = rows.groupBy("g")
      .agg(Aggregates.topKByWeight(col("v"), col("w"), 3).as("top"))
      .queryExecution.executedPlan.toString
    // the PARTIAL (map-side) phase specifically — a final-only plan
    // would still print the aggregate's name, so that must not pass
    assert(plan.contains("partial_bounded_top_k"), plan)
    // and a final/merge phase consumes it after the exchange
    assert(plan.contains("bounded_top_k") && plan.contains("Exchange"), plan)
  }
}
