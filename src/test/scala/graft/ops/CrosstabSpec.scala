package graft.ops

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CrosstabSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 2×2 fixture: weights sum to r1:(1+2)=3, (4)=4 | r2:(8)=8, (0 missing)
  private def fixture = Seq(
    ("r1", "c1", 1.0), ("r1", "c1", 2.0), ("r1", "c2", 4.0), ("r2", "c1", 8.0)
  ).toDF("r", "c", "w")

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Map[(String, String), Row] =
    df.collect().map(r => (r.getString(0), r.getString(r.length - 1)) -> r).toMap

  test("A3 counts matrix + margins (fill 0, Total row/col, grand total)") {
    val out = Crosstab.crosstab(fixture, "r", "c", Some("w"), "total", includeTotals = true, 1)
    assert(out.columns.toSeq == Seq("r", "c1", "c2", "Total", "__type__"))
    val m = rowsOf(out)
    assert(m(("r1", "count")).getDouble(1) == 3.0)
    assert(m(("r1", "count")).getDouble(2) == 4.0)
    assert(m(("r2", "count")).getDouble(2) == 0.0) // fill_value=0
    assert(m(("r1", "count")).getDouble(3) == 7.0) // row total
    assert(m(("Total", "count")).getDouble(1) == 11.0) // col total
    assert(m(("Total", "count")).getDouble(3) == 15.0) // grand
  }

  test("A3 percent=total: cells /grand*100 rounded; Total margins sum rounded cells") {
    val out = Crosstab.crosstab(fixture, "r", "c", Some("w"), "total", includeTotals = true, 1)
    val m = rowsOf(out)
    assert(m(("r1", "%_total")).getDouble(1) == 20.0) // 3/15
    assert(m(("r2", "%_total")).getDouble(1) == 53.3) // 8/15
    assert(m(("Total", "%_total")).getDouble(1) == 73.3) // sum of ROUNDED
  }

  test("A3 percent=row: rows sum to 100, Total row pinned to 100 per column") {
    val out = Crosstab.crosstab(fixture, "r", "c", Some("w"), "row", includeTotals = true, 1)
    val m = rowsOf(out)
    assert(m(("r1", "%_row")).getDouble(1) == 42.9)
    assert(m(("r1", "%_row")).getDouble(2) == 57.1)
    assert(m(("Total", "%_row")).getDouble(1) == 100.0)
    assert(m(("Total", "%_row")).getDouble(2) == 100.0)
    // Total COLUMN for percent=row is the rowwise sum (not pinned)
    assert(m(("r1", "%_row")).getDouble(3) == 100.0)
    assert(m(("Total", "%_row")).getDouble(3) == 200.0)
  }

  test("A3 percent=col: zero column denominator -> null pct; Total col pinned 100") {
    val df = Seq(("r1", "c1", 1.0), ("r2", "c2", 0.0)).toDF("r", "c", "w")
    val out = Crosstab.crosstab(df, "r", "c", Some("w"), "col", includeTotals = true, 1)
    val m = rowsOf(out)
    assert(m(("r1", "%_col")).getDouble(1) == 100.0)
    assert(m(("r1", "%_col")).isNullAt(2)) // 0-denominator column
    assert(m(("r1", "%_col")).getDouble(3) == 100.0) // pinned Total column
    assert(m(("Total", "%_col")).getDouble(2) == 0.0) // pandas sum of all-NaN = 0
  }

  test("A3 null keys dropped from both axes") {
    val df = Seq(("r1", "c1", 1.0), (null, "c1", 5.0), ("r1", null, 7.0))
      .toDF("r", "c", "w")
    val out = Crosstab.crosstab(df, "r", "c", Some("w"), "total", includeTotals = false, 1)
    val counts = out.filter($"__type__" === "count").collect()
    assert(counts.length == 1 && counts(0).getDouble(1) == 1.0)
  }

  test("A3 refuses pathological pivot cardinality with a clear error") {
    val wide = spark.range(Crosstab.MaxPivotValues + 10)
      .selectExpr("'r' AS r", "CAST(id AS STRING) AS c", "1.0 AS w")
    val e = intercept[IllegalArgumentException] {
      Crosstab.crosstab(wide, "r", "c", Some("w"), "total", includeTotals = false, 1)
    }
    assert(e.getMessage.contains("not a crosstab-shaped column"))
  }

  test("A3 includeTotals=false omits margins") {
    val out = Crosstab.crosstab(fixture, "r", "c", Some("w"), "total", includeTotals = false, 1)
    assert(!out.columns.contains("Total"))
    assert(out.filter($"r" === "Total").count() == 0)
  }
}
