package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Keyed time-series operators: the resample lattice must cover every
  * bucket with exact forward-fill, the feature frame must exclude the
  * current row (leakage), and the deviation flag must be the pure
  * integer inequality.
  */
class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  // user 1: buckets 0,1,4 (gap at 2,3); user 2: single bucket
  private def events = Seq(
    (1L, ts("2024-01-01 00:00:10"), 101L, 1.5),
    (1L, ts("2024-01-01 00:00:20"), 102L, 2.5),
    (1L, ts("2024-01-01 00:01:30"), 103L, 10.0),
    (1L, ts("2024-01-01 00:04:05"), 104L, 4.0),
    (2L, ts("2024-01-01 00:02:00"), 201L, 7.25)
  ).toDF("user_id", "ts", "event_id", "value")

  test("resampleGapFill: full lattice, zero-count gaps, exact forward-fill") {
    val out = TimeSeries.resampleGapFill(events, "user_id", "ts", "value", 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
      .sortBy(t => (t._1, t._2))
    val minuteOf = (s: String) => ts(s).getTime / 60000L // epoch minutes
    val b0 = minuteOf("2024-01-01 00:00:00")
    // user 1: five buckets b0..b0+4
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._2).toSeq === (b0 to b0 + 4))
    assert(u1.map(_._3).toSeq === Seq(2L, 1L, 0L, 0L, 1L)) // n_events
    assert(u1.map(_._4).toSeq ===
      Seq(Some(4000000L), Some(10000000L), None, None, Some(4000000L)))
    assert(u1.map(_._5).toSeq === Seq(Some(4000000L), Some(10000000L),
      Some(10000000L), Some(10000000L), Some(4000000L))) // ffill carries
    val u2 = out.filter(_._1 == 2L)
    assert(u2.toSeq === Seq((2L, b0 + 2, 1L, Some(7250000L), Some(7250000L))))
  }

  test("resampleGapFill: lattice guard raises on a span past maxBucketsPerKey") {
    val wide = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 1.0),
      (1L, ts("2024-03-01 00:00:00"), 2L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    val ex = intercept[Exception] {
      TimeSeries.resampleGapFill(wide, "user_id", "ts", "value", 60,
        maxBucketsPerKey = 100).collect()
    }
    assert(ex.getMessage.contains("widen intervalSec") ||
      Option(ex.getCause).exists(_.getMessage.contains("widen intervalSec")))
  }

  test("lagFeatures: lag/delta/gap and a strictly-preceding rolling frame") {
    val out = TimeSeries.lagFeatures(events, "user_id", "ts", "event_id", "value", rollN = 2)
      .filter(col("key") === 1L).orderBy(col("us"))
      .select("vm", "lag_vm", "delta_vm", "gap_us", "roll_n", "roll_sum", "roll_min", "roll_max")
      .collect()
    // row 1: no history
    assert(out(0).isNullAt(1) && out(0).getLong(4) === 0L)
    // row 2 sees exactly row 1
    assert(out(1).getLong(1) === 1500000L && out(1).getLong(2) === 1000000L)
    assert(out(1).getLong(3) === 10000000L) // 10s gap in us
    assert(out(1).getLong(4) === 1L && out(1).getLong(5) === 1500000L)
    // row 3 sees rows 1-2, NOT itself (leakage-safe frame)
    assert(out(2).getLong(4) === 2L && out(2).getLong(5) === 4000000L)
    assert(out(2).getLong(6) === 1500000L && out(2).getLong(7) === 2500000L)
    // row 4's frame slides off row 1
    assert(out(3).getLong(5) === 12500000L)
  }

  test("rollingDeviation: integer inequality flags the planted spike, minObs gates") {
    val steady = (1 to 8).map(i =>
      (1L, ts(f"2024-01-01 00:00:${i}%02d"), i.toLong, if (i == 7) 50.0 else 2.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.rollingDeviation(steady, "user_id", "ts", "event_id", "value",
        rollN = 4, thresholdPct = 200, minObs = 3)
      .orderBy(col("id")).collect()
    assert(out.count(_.getBoolean(7)) === 1)
    assert(out.filter(_.getBoolean(7)).map(_.getLong(1)).toSeq === Seq(7L))
    // first two rows can never flag (roll_n < minObs)
    assert(!out(0).getBoolean(7) && !out(1).getBoolean(7))
    // the spike row's audit arithmetic: 4 prior 2.0s -> sum 8e6, dev = |50e6*4 - 8e6|*100
    val spike = out.filter(_.getLong(1) == 7L).head
    assert(spike.getLong(4) === 8000000L && spike.getLong(6) === 19200000000L)
  }

  test("seasonalProfile: pmod weekday incl. pre-1970, truncating signed mean") {
    // 2024-01-01 is a Monday (dow 0); 1969-12-31 is a Wednesday (dow 2,
    // through the negative-epoch floor-div branch)
    val df = Seq(
      ("a", ts("2024-01-01 10:00:00"), 1.0),
      ("a", ts("2024-01-08 10:00:00"), 2.0),
      ("a", ts("1969-12-31 12:00:00"), 5.0),
      ("n", ts("2024-01-01 10:00:00"), -0.4),
      ("n", ts("2024-01-08 10:00:00"), -0.4),
      ("n", ts("2024-01-15 10:00:00"), -0.3)
    ).toDF("k", "ts", "v")
    val got = TimeSeries.seasonalProfile(df, "k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", 0L)) === ((2L, 3000000L, 1500000L)))
    assert(got(("a", 2L)) === ((1L, 5000000L, 5000000L)),
      "pre-1970 Wednesday must land on dow 2, not share a bucket with Thursday")
    assert(got(("n", 0L)) === ((3L, -1100000L, -366666L)),
      "negative mean truncates toward zero (floor would be -366667)")
  }

  test("seasonalAnomaly: leave-one-out peers flag the spike, not its neighbors") {
    val mondays = Seq("2024-01-01", "2024-01-08", "2024-01-15", "2024-01-22")
    val df = mondays.zipWithIndex.map { case (d, i) =>
      (1L, ts(s"$d 09:00:00"), (i + 1).toLong, if (i == 3) 100.0 else 1.0)
    }.toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.seasonalAnomaly(df, "user_id", "ts", "event_id", "value",
        thresholdPct = 200, minObs = 3)
      .collect().map(r => r.getLong(1) -> r).toMap
    // the spike: peers are the three 1.0 Mondays
    val s = out(4L)
    assert(s.getLong(2) === 0L && s.getLong(4) === 3L && s.getLong(5) === 3000000L)
    assert(s.getLong(6) === math.abs(100000000L * 3 - 3000000L) * 100)
    assert(s.getBoolean(7), "the 100x Monday must flag against its Monday peers")
    // a normal Monday: its peers INCLUDE the spike, and still no flag
    // (|1e6*3 - 102e6|*100 = 1.01e10 < 200 * 102e6 = 2.04e10)
    assert(!out(1L).getBoolean(7))
    // too few peers never flags: a 2-event key is below minObs
    val tiny = Seq(
      (2L, ts("2024-01-01 09:00:00"), 10L, 1.0),
      (2L, ts("2024-01-08 09:00:00"), 11L, 100.0)
    ).toDF("user_id", "ts", "event_id", "value")
    assert(TimeSeries.seasonalAnomaly(tiny, "user_id", "ts", "event_id", "value")
      .collect().forall(!_.getBoolean(7)))
  }

  test("changepointScan: planted level shift found exactly; flat and tiny keys in-band") {
    // key "shift": 10 days at 100 then 10 days at 500 — the split is
    // after position 10 (bucket 9), D = t*(N-t)*|mb-ma| = 10*10*400
    val shift = (0 until 20).map(i => ("shift", i.toLong, if (i < 10) 100L else 500L))
    val flat = (0 until 8).map(i => ("flat", i.toLong, 42L))
    val solo = Seq(("solo", 0L, 7L))
    val df = (shift ++ flat ++ solo).toDF("k", "day", "y").repartition(5)
    val got = TimeSeries.changepointScan(df, "k", "day", "y").collect()
      .map(r => r.getString(0) -> r).toMap
    val s = got("shift")
    assert(s.getLong(2) === 40000L, "cusum_abs = 10*10*400")
    assert(s.getLong(3) === 9L, "split after bucket 9")
    assert((s.getLong(4), s.getLong(5)) === ((10L, 10L)))
    assert((s.getLong(6), s.getLong(7)) === ((100000000L, 500000000L)),
      "segment means in micro")
    // a flat series reports D = 0 at the deterministic first split —
    // zero cusum_abs IS the "no shift" answer
    val f = got("flat")
    assert(f.getLong(2) === 0L && f.getLong(4) === 1L)
    assert(f.getLong(6) === f.getLong(7))
    // a single-point key has no internal split: NULLs in-band
    assert(got("solo").isNullAt(2) && got("solo").isNullAt(3))
    // duplicate (key, bucket) rows pre-sum: splitting day 3 into two
    // half-rows changes nothing
    val dup = (shift.filterNot(_._2 == 3L) ++
      Seq(("shift", 3L, 60L), ("shift", 3L, 40L))).toDF("k", "day", "y")
    val d2 = TimeSeries.changepointScan(dup, "k", "day", "y").collect().head
    assert(d2.getLong(2) === 40000L && d2.getLong(3) === 9L)
  }
}
