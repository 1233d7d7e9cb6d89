package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CohortsSpec extends AnyFunSuite {

  test("eventTrigrams: consecutive type trigrams per user, ordered by (ts, id)") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    def t(s: Int) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, t(1), 1L, "view"), (1L, t(2), 2L, "click"), (1L, t(3), 3L, "buy"),
      (1L, t(4), 4L, "view"),
      (2L, t(1), 5L, "view"), (2L, t(2), 6L, "click"), (2L, t(3), 7L, "buy"),
      (3L, t(1), 8L, "view"), (3L, t(2), 9L, "click") // too short: no trigram
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Cohorts.eventTrigrams(ev)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got === Map(
      ("view", "click", "buy") -> 2L,
      ("click", "buy", "view") -> 1L))
  }

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2Intervals: runs merge, changes close intervals, current row open") {
    val df = Seq(
      // user 1: A, A, B, A -> three intervals
      (1L, 1L, "A", ts("2024-01-01 10:00:00")),
      (2L, 1L, "A", ts("2024-01-01 11:00:00")),
      (3L, 1L, "B", ts("2024-01-01 12:00:00")),
      (4L, 1L, "A", ts("2024-01-01 13:00:00")),
      // user 2: single event -> one open interval
      (5L, 2L, "C", ts("2024-01-01 10:30:00")),
      // user 3: simultaneous ts resolves by arrival id (B then A)
      (6L, 3L, "B", ts("2024-01-01 10:00:00")),
      (7L, 3L, "A", ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    def us(s: String) = ts(s).getTime * 1000L
    val got = Cohorts.scd2Intervals(df, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == Set(
      (1L, "A", us("2024-01-01 10:00:00"), us("2024-01-01 12:00:00")),
      (1L, "B", us("2024-01-01 12:00:00"), us("2024-01-01 13:00:00")),
      (1L, "A", us("2024-01-01 13:00:00"), -1L),
      (2L, "C", us("2024-01-01 10:30:00"), -1L),
      (3L, "B", us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00")),
      (3L, "A", us("2024-01-01 10:00:00"), -1L)))
  }

  test("engagement: per-month active days, MAU, avg DAU, stickiness") {
    val df = Seq(
      // Jan: day 1 has users {1,2}, day 2 has {1}; MAU = 2
      (1L, ts("2024-01-01 09:00:00")), (2L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-02 09:00:00")), (1L, ts("2024-01-02 11:00:00")),
      // Feb: one day, one user
      (3L, ts("2024-02-10 09:00:00"))
    ).toDF("user_id", "ts")
    val got = Cohorts.engagement(df, "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got((2024L, 1L)) == ((2L, 2L, 1.5, 0.75))) // (2+1)/2 days; /MAU 2
    assert(got((2024L, 2L)) == ((1L, 1L, 1.0, 1.0)))
  }

  test("retentionMatrix: cohorts by first month, offsets count distinct actives") {
    val df = Seq(
      // user 1: joins Jan, active Jan + Mar
      (1L, ts("2024-01-05 10:00:00")), (1L, ts("2024-01-20 10:00:00")),
      (1L, ts("2024-03-02 10:00:00")),
      // user 2: joins Jan, active Jan only
      (2L, ts("2024-01-15 10:00:00")),
      // user 3: joins Feb, active Feb + Mar; year boundary check below
      (3L, ts("2024-02-01 10:00:00")), (3L, ts("2024-03-30 10:00:00")),
      // user 4: joins Dec 2023, active Jan 2024 (offset crosses the year)
      (4L, ts("2023-12-31 23:59:59")), (4L, ts("2024-01-01 00:00:01"))
    ).toDF("user_id", "ts")
    val got = Cohorts.retentionMatrix(df, "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got == Map(
      (2024L, 1L, 0L) -> 2L, // Jan cohort: users 1, 2
      (2024L, 1L, 2L) -> 1L, // user 1 back in March
      (2024L, 2L, 0L) -> 1L, // Feb cohort: user 3
      (2024L, 2L, 1L) -> 1L, // user 3 in March
      (2023L, 12L, 0L) -> 1L, // Dec-2023 cohort: user 4
      (2023L, 12L, 1L) -> 1L  // user 4 in Jan 2024 — offset spans the year
    ))
  }

  test("kaplanMeier: hand-checked curve — censoring holds survival, events step it down") {
    val subjects = Seq(
      ("a", 1L, true), ("a", 2L, false), ("a", 3L, true),
      ("a", 3L, true), ("a", 4L, false), ("a", 5L, true)
    ).toDF("g", "dur", "ev")
    val got = Cohorts.kaplanMeier(subjects, "g", "dur", "ev")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // (n_risk, d, c, hazard, survival)
    assert(got(1L) === ((6L, 1L, 0L, 166666L, 833333L)))
    assert(got(2L) === ((5L, 0L, 1L, 0L, 833333L)), "a censor-only time must not move S")
    assert(got(3L) === ((4L, 2L, 0L, 500000L, 416666L)))
    assert(got(4L) === ((2L, 0L, 1L, 0L, 416666L)))
    assert(got(5L) === ((1L, 1L, 0L, 1000000L, 0L)))
  }

  test("kaplanMeier: censoring vs churn — treating censored as events biases S down") {
    val censored = Seq(("a", 1L, true), ("a", 2L, false), ("a", 2L, false))
      .toDF("g", "dur", "ev")
    val asChurn = censored.withColumn("ev", lit(true))
    def s2(df: org.apache.spark.sql.DataFrame) =
      Cohorts.kaplanMeier(df, "g", "dur", "ev")
        .filter(col("t") === 2L).head().getAs[Long]("survival_micro")
    assert(s2(censored) == 666666L)  // 2/3 survive past t=1, censors hold it
    assert(s2(asChurn) == 0L, "the naive churn read zeroes survival")
  }

  test("kaplanMeier: negative durations and oversized lattices raise in-plan") {
    val bad = Seq(("a", -1L, true)).toDF("g", "dur", "ev")
    val e = intercept[Exception](Cohorts.kaplanMeier(bad, "g", "dur", "ev").collect())
    def msgs(ex: Throwable) = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs(e).contains("negative duration"))
    val wide = spark.range(5000).selectExpr("'g' AS g", "id AS dur", "true AS ev")
    val e2 = intercept[Exception](Cohorts.kaplanMeier(wide, "g", "dur", "ev").collect())
    assert(msgs(e2).contains("band the duration"))
  }

  test("rollingDistinctKmv: merged day sketches equal the direct window sketch") {
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    def poly31(s: String): Long = // kmvHash31 replay: poly fold + affine scramble
      (s.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 2147483647L)
        * 514229L + 741103L) % 2147483647L
    // 10 days, 12 ids/day with 6-id overlap between consecutive days;
    // day 5 is a GAP (range frame must narrow, not slide over rows)
    val rows = for {
      day <- (0 until 10) if day != 5
      i <- 0 until 12
    } yield (new Timestamp(day * 86400000L), (day * 6 + i).toLong)
    val df = rows.toDF("ts", "user_id").repartition(7)
    val k = 16
    val got = Cohorts.rollingDistinctKmv(df, "ts", "user_id", windowDays = 3, k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(got.keySet === (0 until 10).filter(_ != 5).map(_.toLong).toSet)
    // driver replay: the DIRECT window k-minimum construction — the
    // merge of per-day sketches must coincide (KMV mergeability)
    val byDay = rows.groupBy(_._1.getTime / 86400000L)
      .map { case (d, rs) => d -> rs.map(t => poly31(t._2.toString)).distinct }
    got.foreach { case (d, (nEv, nKept, exact, est)) =>
      val win = (d - 2 to d).flatMap(byDay.get).flatten.distinct.sorted
      val kept = win.take(k)
      assert(nKept === kept.size.toLong, s"day $d")
      assert(exact === (win.size < k), s"day $d")
      val expected = if (win.size < k) win.size.toLong
        else (k - 1).toLong * 2147483647L / kept.last
      assert(est === expected, s"day $d: $est vs $expected")
      assert(nEv === byDay(d).size.toLong * 1) // 12 events/day, all distinct ids
    }
    // deterministic across partitionings
    val again = Cohorts.rollingDistinctKmv(df.repartition(3), "ts", "user_id",
      windowDays = 3, k = k).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(again === got.map { case (d, v) => d -> v._4 })
  }
}
