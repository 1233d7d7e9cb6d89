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

  private def leftIvals = Seq(
    (1L, 0.0, 10.0),
    (2L, 5.0, 25.0),   // spans several bins at small widths
    (3L, 40.0, 30.0),  // empty: matches nothing
    (4L, 100.0, 100.0) // point
  ).toDF("lid", "ls", "le")
  private def rightIvals = Seq(
    (10L, 8.0, 12.0),   // overlaps 1 and 2
    (11L, 10.0, 10.0),  // point touching 1's end and inside 2
    (12L, 26.0, 30.0),  // overlaps nothing (2 ends at 25)
    (13L, 100.0, 200.0) // touches the point interval 4
  ).toDF("rid", "rs", "re")

  test("intervalJoin equals the brute-force overlap join, exactly once per pair") {
    val brute = leftIvals.crossJoin(rightIvals)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(brute == Set((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L), (4L, 13L)))
    for (w <- Seq(0.5, 3.0, 7.0, 1000.0)) {
      val rows = RangeJoin.intervalJoin(
        leftIvals, "ls", "le", rightIvals, "rs", "re", binWidth = w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq
      // set equality AND no duplicates: the first-shared-bin election
      // emits each pair once even when the overlap spans many bins
      assert(rows.toSet == brute, s"binWidth=$w")
      assert(rows.size == brute.size, s"binWidth=$w duplicated pairs: $rows")
    }
  }

  test("intervalJoin: NULL and NaN bounds never match; empty intervals drop") {
    val l = Seq((1L, Some(0.0), Some(10.0)), (2L, None, Some(10.0)),
      (3L, Some(Double.NaN), Some(Double.NaN))).toDF("lid", "ls", "le")
    val r = Seq((10L, Some(9.0), Some(11.0)), (11L, Some(1.0), None))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.intervalJoin(l, "ls", "le", r, "rs", "re", binWidth = 5.0)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L)))
  }

  test("intervalJoin plans as an equi-join on the bin key") {
    val plan = RangeJoin.intervalJoin(
      leftIvals, "ls", "le", rightIvals, "rs", "re", binWidth = 7.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
