package graft.bht

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TrendSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("wave-over-wave deltas per group, null on first wave and zero base") {
    val df = Seq(
      (1, "A", 2.0), (1, "A", 2.0), // wave 1: A=4
      (2, "A", 6.0),                // wave 2: A=6 → delta +2, +50%
      (3, "A", 3.0),                // wave 3: A=3 → delta -3, -50%
      (1, "B", 0.0),                // wave 1: B=0
      (2, "B", 5.0)                 // wave 2: B=5 → delta +5, pct null (0 base)
    ).toDF("wave", "brand", "w")
    val out = Trend.waveOverWave(df, "wave", Seq("brand"), Some("w"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getDouble(2), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .toMap
    assert(out((1, "A")) == (4.0, None, None, None))
    assert(out((2, "A")) == (6.0, Some(4.0), Some(2.0), Some(50.0)))
    assert(out((3, "A")) == (3.0, Some(6.0), Some(-3.0), Some(-50.0)))
    assert(out((2, "B")) == (5.0, Some(0.0), Some(5.0), None)) // zero base
  }

  test("weighted NPS per group with exact integer weights") {
    val df = Seq(
      ("g1", 10.0, 3.0), ("g1", 0.0, 1.0), ("g1", 7.0, 2.0), // prom 3, detr 1, pass 2, n 6
      ("g2", 5.0, 4.0)                                        // all detractors
    ).toDF("g", "score", "w")
    val out = Kpis.npsSummaryWeighted(df, "score", "w", Seq("g"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3), r.getDouble(4), Option(r.get(5))))
      .toMap
    // g1: nps = (3/6 - 1/6)*100 = 33.33...
    val (detr, prom, n, nps) = out("g1")
    assert(detr == 1.0 && prom == 3.0 && n == 6.0)
    assert(math.abs(nps.get.asInstanceOf[Double] - 100.0 / 3.0) < 1e-9)
    assert(out("g2")._4.get.asInstanceOf[Double] == -100.0)
  }

  test("weighted CSAT: weighted mean, top-2-box vs observed max, all-rows denominator") {
    // scores: 10 (w=1), 9 (w=2), 5 (w=1); max=10 → top2 threshold 9
    val df = Seq(("g", Some(10.0), 1.0), ("g", Some(9.0), 2.0),
      ("g", Some(5.0), 1.0), ("g", None, 4.0)).toDF("g", "score", "w")
    val out = Kpis.csatSummaryWeighted(df, "score", "w", Seq("g")).collect()(0)
    assert(out.getDouble(1) == (10.0 + 18.0 + 5.0) / 4.0) // weighted mean over non-null
    assert(out.getDouble(2) == 3.0 / 8.0) // top2 weight / ALL weight incl. null-score row
    assert(out.getDouble(3) == 4.0)       // weighted n over non-null scores
  }

  test("weighted NPS: zero weighted n -> null nps") {
    val df = Seq(("g", Option.empty[Double], 5.0)).toDF("g", "score", "w")
    val out = Kpis.npsSummaryWeighted(df, "score", "w", Seq("g")).collect()(0)
    assert(out.getDouble(4) == 0.0) // n
    assert(out.isNullAt(5))         // nps
  }
}
