package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def values = Seq(1.0, 5.0, 10.0, 17.0, 99.0, 100.0)
    .toDF("v")
  private def intervals = Seq(
    (1L, 0.0, 10.0),    // catches 1, 5, 10 (inclusive both ends)
    (2L, 10.0, 20.0),   // catches 10, 17 (overlapping intervals both match)
    (3L, 50.0, 40.0),   // empty (lo > hi): matches nothing
    (4L, 100.0, 100.0)  // point interval: catches 100 exactly
  ).toDF("band", "lo", "hi")

  test("binned range join equals the brute-force BETWEEN join") {
    val got = RangeJoin.rangeJoin(values, "v", intervals, "lo", "hi", binWidth = 7.0)
      .select("band", "v").as[(Long, Double)].collect().toSet
    val brute = values.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("band", "v").as[(Long, Double)].collect().toSet
    assert(got == brute)
    assert(got == Set((1L, 1.0), (1L, 5.0), (1L, 10.0), (2L, 10.0), (2L, 17.0), (4L, 100.0)))
  }

  test("nulls never match; result invariant to binWidth") {
    val nv = Seq(Some(5.0), None).toDF("v")
    val ni = Seq((1L, Some(0.0), Some(10.0)), (2L, None, Some(10.0))).toDF("band", "lo", "hi")
    for (w <- Seq(0.5, 3.0, 1000.0)) {
      val got = RangeJoin.rangeJoin(nv, "v", ni, "lo", "hi", binWidth = w)
        .select("band", "v").as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 5.0)), s"binWidth=$w")
    }
  }

  test("the plan is an equi-join on the bin key, not a nested loop") {
    val plan = RangeJoin.rangeJoin(values, "v", intervals, "lo", "hi", binWidth = 7.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("degenerate interval fails fast instead of exploding") {
    val wide = Seq((1L, 0.0, 1e9)).toDF("band", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.rangeJoin(values, "v", wide, "lo", "hi",
        binWidth = 1.0, maxBinsPerInterval = 100).count()
    }
    assert(e.getMessage.contains("widen binWidth") ||
      e.getCause != null && e.getCause.getMessage.contains("widen binWidth"))
  }

  test("extreme bounds reach the guard message, not a cast overflow") {
    // bins at 1e30 overflow any long — the clear raise_error must win
    // over ANSI CAST_OVERFLOW (double binning happens before the cast)
    val extreme = Seq((1L, 1.0e30, 1.0e30 + 10)).toDF("band", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.rangeJoin(values, "v", extreme, "lo", "hi", binWidth = 1.0).count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    // its own message, distinct from the too-many-bins case
    assert(msg.contains("long-safe range"), msg)
    // an extreme VALUE just drops (cannot match any guarded interval)
    val ev = Seq(1.0e30, 5.0).toDF("v")
    val ok = RangeJoin.rangeJoin(ev, "v", intervals, "lo", "hi", binWidth = 7.0)
      .select("v").as[Double].collect().toSeq
    assert(ok == Seq(5.0))
  }

  test("NaN-bounded intervals match nothing (as BETWEEN), not abort") {
    // Spark's ORDERING has NaN = NaN, so a (NaN, NaN) interval passes
    // lo <= hi — it must be dropped, not raise through the bin guard
    val withNan = Seq((1L, 0.0, 10.0), (2L, Double.NaN, Double.NaN))
      .toDF("band", "lo", "hi")
    val got = RangeJoin.rangeJoin(values, "v", withNan, "lo", "hi", binWidth = 7.0)
      .select("band", "v").as[(Long, Double)].collect().toSet
    assert(got == Set((1L, 1.0), (1L, 5.0), (1L, 10.0)))
  }

  test("shared or reserved column names are rejected at build time") {
    val clash = Seq((1L, 0.0, 10.0)).toDF("band", "lo", "v") // "v" also in values
    val e = intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(values, "v", clash, "lo", "v", binWidth = 7.0)
    }
    assert(e.getMessage.contains("share column names"))
  }
}
