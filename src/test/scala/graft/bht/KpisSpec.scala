package graft.bht

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class KpisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def metricMap(df: org.apache.spark.sql.DataFrame): Map[String, Option[Double]] =
    df.collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  test("A7 CSAT: mean skips nulls, top2 threshold = max-1 with all-rows denominator") {
    // values 5,5,4,3,null → max=5, top2 = count(>=4)/5 rows = 3/5
    val df = Seq("5", "5", "4", "3", null).toDF("csat")
    val m = metricMap(Kpis.csatSummary(df, "csat"))
    assert(m("mean").contains(4.25))
    assert(m("top2_box").contains(0.6))
    assert(m("n").contains(4.0))
  }

  test("A7 CSAT all-null column: mean/top2 null, n=0") {
    val df = Seq("x", "y").toDF("csat") // unparseable → all null after coercion
    val m = metricMap(Kpis.csatSummary(df, "csat"))
    assert(m("mean").isEmpty && m("top2_box").isEmpty && m("n").contains(0.0))
  }

  test("A8 NPS: buckets, out-of-range counts in n only") {
    // 10,9 promoters; 7 passive; 3,0 detractors; 11 out-of-range; null excluded
    val df = Seq("10", "9", "7", "3", "0", "11", null).toDF("nps")
    val m = metricMap(Kpis.npsSummary(df, "nps"))
    assert(m("promoters").contains(2.0))
    assert(m("passives").contains(1.0))
    assert(m("detractors").contains(2.0))
    assert(m("n").contains(6.0))
    assert(m("nps").exists(v => math.abs(v - 0.0) < 1e-9)) // (2/6 - 2/6)*100
  }

  test("A8 NPS n=0: only (nps=null, n=0)") {
    val df = Seq("x", null).toDF("nps")
    val out = Kpis.npsSummary(df, "nps")
    val m = metricMap(out)
    assert(out.count() == 2 && m("nps").isEmpty && m("n").contains(0.0))
  }
}
