package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PrivacySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // combo (a,x): 3 rows; (a,y): 1 row; (b,x): 2 rows
  private def df = Seq(
    ("a", "x", 1), ("a", "x", 2), ("a", "x", 3),
    ("a", "y", 4),
    ("b", "x", 5), ("b", "x", 6)
  ).toDF("q1", "q2", "id")

  test("risk list contains exactly the sub-k combos") {
    val risky = Privacy.kAnonymityRisk(df, Seq("q1", "q2"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(risky == Map(("a", "y") -> 1L, ("b", "x") -> 2L))
  }

  test("summary: groups, risky, rows at risk, min cell") {
    val s = Privacy.kAnonymitySummary(df, Seq("q1", "q2"), k = 3).collect()(0)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) == (3L, 2L, 3L, 1L))
  }

  test("suppression yields a k-anonymous release") {
    val released = Privacy.suppress(df, Seq("q1", "q2"), k = 3)
    assert(released.count() == 3)
    val check = Privacy.kAnonymityRisk(released, Seq("q1", "q2"), k = 3)
    assert(check.count() == 0) // k-anonymous by construction
  }

  test("suppression is null-safe: risky combos with null quasi-identifiers are dropped") {
    // (a,x): 3 rows (safe); (null,x): 2 rows and (a,null): 1 row — both risky
    val withNulls = Seq(
      (Some("a"), Some("x"), 1), (Some("a"), Some("x"), 2), (Some("a"), Some("x"), 3),
      (None, Some("x"), 4), (None, Some("x"), 5),
      (Some("a"), None, 6)
    ).toDF("q1", "q2", "id")
    val released = Privacy.suppress(withNulls, Seq("q1", "q2"), k = 3)
    assert(released.select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3))
    // audit and suppression must agree: release is k-anonymous
    assert(Privacy.kAnonymityRisk(released, Seq("q1", "q2"), k = 3).count() == 0)
  }

  test("lDiversity: uniform-sensitive cells flag risky even when k-safe; nulls don't count") {
    import spark.implicits._
    // cell a: 4 rows, all same diagnosis (k-safe at k=3, l-risky at l=2)
    // cell b: 4 rows, 3 distinct -> safe at l=2
    // cell c: 2 rows, sensitive all null -> diversity 0, risky
    val df = Seq(
      ("a", Some("flu")), ("a", Some("flu")), ("a", Some("flu")), ("a", Some("flu")),
      ("b", Some("flu")), ("b", Some("cold")), ("b", Some("ache")), ("b", Some("flu")),
      ("c", None), ("c", None)
    ).toDF("q", "dx")
    val risky = Privacy.lDiversityRisk(df, Seq("q"), "dx", l = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(risky == Map("a" -> ((4L, 1L)), "c" -> ((2L, 0L))))
    val s = Privacy.lDiversitySummary(df, Seq("q"), "dx", l = 2).head
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getLong(3)) == ((3L, 2L, 6L, 0L)))
  }
}
