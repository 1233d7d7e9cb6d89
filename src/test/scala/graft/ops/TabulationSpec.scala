package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class TabulationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("A1 valueCounts: drops null/empty, trims, counts desc") {
    val df = Seq("a", " a ", "b", "", null, "b", "b").toDF("c")
    val got = Tabulation.valueCounts(df, "c").as[(String, Long)].collect()
    assert(got.toSeq == Seq(("b", 3L), ("a", 2L)))
  }

  test("A2 freqTable: weighted counts, null key -> 'nan', pct sums to ~100") {
    val df = Seq(("x", 2.0), ("x", 3.0), ("y", 5.0), (null, 10.0)).toDF("c", "w")
    val rows = Tabulation.freqTable(df, "c", Some("w"), 1)
      .as[(String, String, Double, Double)].collect()
    val byVal = rows.map(r => r._2 -> (r._3, r._4)).toMap
    assert(byVal("x") == (5.0, 25.0))
    assert(byVal("y") == (5.0, 25.0))
    assert(byVal("nan") == (10.0, 50.0))
    assert(math.abs(rows.map(_._4).sum - 100.0) < 0.5)
    assert(rows.forall(_._1 == "c"))
  }

  test("A2 freqTable: zero total weight -> null pct") {
    val df = Seq(("x", 0.0), ("y", 0.0)).toDF("c", "w")
    val pcts = Tabulation.freqTable(df, "c", Some("w"), 1)
      .select("pct_total").collect().map(r => Option(r.get(0)))
    assert(pcts.forall(_.isEmpty))
  }

  test("A5 fullTabulation: every column, nulls become 'nan' groups, counts sum to rowcount") {
    val df = Seq(("a", Some(1)), ("b", None), ("a", Some(1))).toDF("s", "i")
    val got = Tabulation.fullTabulation(df).as[(String, String, Long)].collect()
    assert(got.filter(_._1 == "s").map(_._3).sum == 3)
    assert(got.filter(_._1 == "i").map(_._3).sum == 3)
    assert(got.contains(("i", "nan", 1L)))
    assert(got.contains(("s", "a", 2L)))
  }

  test("A5 boolean columns stringify as True/False (pandas astype(str) parity)") {
    val df = Seq((true, "a"), (false, "b"), (true, "c")).toDF("flag", "k")
    val got = Tabulation.fullTabulation(df, Seq("flag")).as[(String, String, Long)].collect()
    assert(got.toSet == Set(("flag", "True", 2L), ("flag", "False", 1L)))
  }

  test("A5 timestamp columns follow pandas str() formatting") {
    val df = Seq(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:07"),
      java.sql.Timestamp.valueOf("2024-01-01 00:00:07.1"),
      java.sql.Timestamp.valueOf("2024-01-03 10:30:00.123456")).toDF("ts")
    val got = Tabulation.fullTabulation(df).select("value").as[String].collect().toSet
    assert(got == Set(
      "2024-01-01 00:00:07",          // zero fraction omitted
      "2024-01-01 00:00:07.100000",   // full 6 digits when nonzero
      "2024-01-03 10:30:00.123456"))
  }

  test("A6 selectedCounts: one row per column with T6 semantics, unweighted") {
    val df = Seq(("1", "0"), ("0", "yes"), ("", "0.0"), (null, null))
      .toDF("brand_a", "brand_b")
    val got = Tabulation.selectedCounts(df, Seq("brand_a", "brand_b"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("brand_a" -> 1L, "brand_b" -> 2L))
  }

  test("T10 distinctValues: trimmed, non-empty, sorted") {
    val df = Seq(" b ", "a", "", null, "b").toDF("c")
    val got = Tabulation.distinctValues(df, "c").as[String].collect()
    assert(got.toSeq == Seq("a", "b"))
  }
}
