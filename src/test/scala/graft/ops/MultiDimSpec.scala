package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultiDimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture = Seq(
    (Some("a"), "x", 1.0), (Some("a"), "y", 3.0), (Some("b"), "x", 4.0),
    (None, "x", 2.0) // null group key must be KEPT (pandas dropna=False)
  ).toDF("d1", "d2", "w")

  test("A4 percent of total, null keys kept") {
    val out = MultiDim.multiDimTabulation(fixture, Seq("d1", "d2"), Some("w"), "total", 1)
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(out((Some("a"), "x")) == (1.0, 10.0))
    assert(out((Some("b"), "x")) == (4.0, 40.0))
    assert(out((None, "x")) == (2.0, 20.0))
  }

  test("A4 percent within a dim level") {
    val out = MultiDim.multiDimTabulation(fixture, Seq("d1", "d2"), Some("w"), "d1", 0)
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out((Some("a"), "x")) == 25.0) // 1 of 4 within d1=a
    assert(out((Some("a"), "y")) == 75.0)
    assert(out((Some("b"), "x")) == 100.0)
    assert(out((None, "x")) == 100.0) // null level percents within itself
  }

  test("A4 unknown percent_by -> null pct") {
    val out = MultiDim.multiDimTabulation(fixture, Seq("d1"), Some("w"), "nope", 1)
    assert(out.select("pct").collect().forall(_.isNullAt(0)))
  }

  test("A4 rejects >3 dims") {
    assertThrows[IllegalArgumentException] {
      MultiDim.multiDimTabulation(fixture, Seq("a", "b", "c", "d"), None, "total", 1)
    }
  }

  test("rollup tabulation: all levels in one aggregate, 'Total' labels, grouping flags") {
    val df = Seq(("a", "x", 1.0), ("a", "y", 3.0), ("b", "x", 4.0)).toDF("d1", "d2", "w")
    val out = MultiDim.rollupTabulation(df, Seq("d1", "d2"), Some("w"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getInt(3)) -> r.getDouble(4))
      .toMap
    assert(out(("a", "x", 0, 0)) == 1.0)
    assert(out(("a", "Total", 0, 1)) == 4.0) // subtotal per d1
    assert(out(("b", "Total", 0, 1)) == 4.0)
    assert(out(("Total", "Total", 1, 1)) == 8.0) // grand total
    assert(out.size == 6) // 3 cells + 2 subtotals + 1 grand total
  }
}
