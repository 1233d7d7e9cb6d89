package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def left = Seq(
    (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u2", 150L), (4L, "u3", 50L)
  ).toDF("id", "user", "ts")

  private def right = Seq(
    ("u1", 90L, "a"), ("u1", 100L, "b"), ("u1", 180L, "c"),
    ("u2", 150L, "d"), ("u2", 160L, "e")
  ).toDF("user", "ts", "tag")

  test("backward match, equal-ts inclusive, unmatched null") {
    val r2 = right.withColumn("rts", org.apache.spark.sql.functions.col("ts"))
      .select("user", "ts", "rts", "tag")
    val out = AsOf.asofJoin(left, r2, Seq("user"), "ts", "ts", Seq("rts", "tag"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)))).toMap
    // left id=1 (u1, ts=100): right (u1,100,"b") matches inclusively
    assert(out(1L) == (Some(100L), Some("b")))
    // left id=2 (u1, ts=200): latest right <= 200 is (u1,180,"c")
    assert(out(2L) == (Some(180L), Some("c")))
    // left id=3 (u2, ts=150): equal-ts match (u2,150,"d"); NOT the later 160
    assert(out(3L) == (Some(150L), Some("d")))
    // left id=4 (u3): no right rows for u3 at all
    assert(out(4L) == (None, None))
  }

  test("asofJoinTolerance: stale matches null out, fresh ones survive") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val l = this.left.withColumn("ts", timestamp_micros(col("ts")))
    val r = this.right.withColumn("ts", timestamp_micros(col("ts")))
    val out = AsOf.asofJoinTolerance(l, r, Seq("user"), "ts", "ts", Seq("tag"), 15L)
      .collect().map(x => x.getLong(0) -> Option(x.get(3))).toMap
    assert(out(1L) == Some("b"))  // diff 0 <= 15
    assert(out(2L) == None)       // nearest match is 20us old: dropped, not replaced
    assert(out(3L) == Some("d"))  // equal-ts inclusive
    assert(out(4L) == None)       // no candidate at all
  }

  test("value columns come from the same right row") {
    val r2 = right.withColumn("rts", org.apache.spark.sql.functions.col("ts"))
      .select("user", "ts", "rts", "tag")
    val out = AsOf.asofJoin(left, r2, Seq("user"), "ts", "ts", Seq("rts", "tag"))
      .collect()
    out.filter(_.getLong(0) == 2L).foreach { r =>
      assert(r.getLong(3) == 180L && r.getString(4) == "c")
    }
  }

  test("null right timestamps never match (DuckDB ASOF parity)") {
    val l = Seq((1L, "u9", 50L)).toDF("id", "user", "ts")
    val r = Seq(("u9", Option.empty[Long], "ghost"), ("u9", Some(100L), "late"))
      .toDF("user", "rts", "tag")
    val out = AsOf.asofJoin(l, r, Seq("user"), "ts", "rts", Seq("tag")).collect()(0)
    assert(out.isNullAt(3)) // neither the null-ts row nor the later row matches
  }

  test("rejects value/left column collisions") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, Seq("user"), "ts", "ts", Seq("ts"))
    }
  }

  test("survives dotted survey-style column names") {
    val l = Seq((1L, "u1", 100L)).toDF("Q1. Id", "who", "Q2. When")
    val r = Seq(("u1", 90L, "x")).toDF("who", "Q2. When", "Q3. Tag")
      .select(org.apache.spark.sql.functions.col("who"),
        org.apache.spark.sql.functions.col("`Q2. When`"),
        org.apache.spark.sql.functions.col("`Q3. Tag`"))
    val out = AsOf.asofJoin(l, r, Seq("who"), "Q2. When", "Q2. When", Seq("Q3. Tag"))
      .collect()(0)
    assert(out.getString(3) == "x")
  }
}
