package graft.scale

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Preference operators: rollups must count exactly, and the
  * fixed-iteration Bradley-Terry must rank a transitive tournament
  * correctly with the winner pinned at the 1e6 rescale ceiling.
  */
class PreferencesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // round-robin: 1 beats 2 (3:1), 2 beats 3 (3:1), 1 beats 3 (4:0)
  private def games = Seq(
    (1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L),
    (2L, 3L), (2L, 3L), (2L, 3L), (3L, 2L),
    (1L, 3L), (1L, 3L), (1L, 3L), (1L, 3L)
  ).toDF("winner", "loser")

  test("itemStats: exact wins/losses/games and integer winrate") {
    val m = Preferences.itemStats(games, "winner", "loser")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(m(1L) === ((7L, 1L, 8L, 875000L)))
    assert(m(2L) === ((4L, 4L, 8L, 500000L)))
    assert(m(3L) === ((1L, 7L, 8L, 125000L)))
  }

  test("pairStats: canonical a<b pairs, wins_a exact, self-games dropped") {
    val withSelf = games.union(Seq((5L, 5L)).toDF("winner", "loser"))
    val m = Preferences.pairStats(withSelf, "winner", "loser")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m.size === 3)
    assert(m((1L, 2L)) === ((4L, 3L)))
    assert(m((2L, 3L)) === ((4L, 3L)))
    assert(m((1L, 3L)) === ((4L, 4L)))
  }

  test("btStrengths: transitive tournament ranks 1 > 2 > 3, winner at the 1e6 ceiling") {
    val s = Preferences.btStrengths(games, "winner", "loser", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(s(1L) === 1000000L) // max-divisor rescale pins the leader
    assert(s(1L) > s(2L) && s(2L) > s(3L))
    assert(s(3L) > 0L) // Laplace smoothing keeps everyone positive
  }

  test("btStrengths: a winless item still ranks by its opposition, no division blowup") {
    val g = Seq((1L, 2L), (1L, 2L), (2L, 3L), (1L, 3L)).toDF("winner", "loser")
    val s = Preferences.btStrengths(g, "winner", "loser", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(s(1L) === 1000000L && s(3L) > 0L && s(1L) > s(2L) && s(2L) > s(3L))
  }

  test("btConvergence: decaying deltas; the default 4 iterations is rank-stable vs 8") {
    // a denser deterministic tournament than `games`: 12 items, every
    // pair played 1-4 times with a hash-seeded but fixed outcome
    val g = (for (a <- 1 to 12; b <- 1 to 12 if a < b; r <- 1 to (a + b) % 4 + 1)
      yield if ((a * 7 + b * 3 + r) % 5 < 3) (a.toLong, b.toLong) else (b.toLong, a.toLong))
      .toDF("winner", "loser")
    val curve = Preferences.btConvergence(g, "winner", "loser", iterations = 8)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert((2 to 8).forall(i => curve(i) <= curve(i - 1)),
      s"per-iteration max deltas must not grow: $curve")
    assert(curve(4) < curve(1) / 5,
      s"by the default 4 iterations the step must shrink below 20% of step 1: $curve")
    def ranking(iters: Int) =
      Preferences.btStrengths(g, "winner", "loser", iterations = iters)
        .orderBy(desc("strength_micro"), asc("item"))
        .select("item").as[Long].collect().toSeq
    assert(ranking(4) === ranking(8),
      "the default iteration count must already be rank-stable vs 2x the iterations")
  }

  test("winRateWilson: brackets p, shrinks with sample size, replays the formula") {
    val w = Preferences.winRateWilson(games, "winner", "loser")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getDouble(5), r.getDouble(6)))).toMap
    // independent replay of the documented expression for item 1 (7/8)
    def wilson(wins: Long, n: Long): (Double, Double) = {
      val z = 1.96; val nn = n.toDouble; val p = wins.toDouble / nn
      val zz = z * z
      val a = p + zz / (2.0 * nn)
      val b = math.sqrt(p * (1.0 - p) / nn + zz / (4.0 * (nn * nn)))
      val den = 1.0 + zz / nn
      (math.floor((a - z * b) / den * 1e6 + 0.5) / 1e6,
        math.floor((a + z * b) / den * 1e6 + 0.5) / 1e6)
    }
    val (lo1, hi1) = wilson(7L, 8L)
    assert(w(1L)._3 === lo1 && w(1L)._4 === hi1)
    assert(w(1L)._3 < 0.875 && 0.875 < w(1L)._4)
    // 4x the games at the same rate -> strictly narrower band
    val big = games.union(games).union(games).union(games)
    val wb = Preferences.winRateWilson(big, "winner", "loser")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(5), r.getDouble(6)))).toMap
    assert(wb(1L)._2 - wb(1L)._1 < w(1L)._4 - w(1L)._3)
  }

  test("cohenKappa: hand case exact; duplicate ratings collapse to min; empty overlap is null-rated") {
    // 10 items, 8/10 agreement, balanced marginals: po=0.8, pe=0.5,
    // kappa=0.6 exactly on the micro grid
    val rows =
      (1 to 10).map(i => (i.toLong, "a", if (i <= 5) "x" else "y")) ++
        (1 to 10).map(i => (i.toLong, "b",
          if (i == 5) "y" else if (i == 10) "x" else if (i <= 5) "x" else "y"))
    val r = Preferences.cohenKappa(rows.toDF("item", "rater", "label"),
      "item", "rater", "label", "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1)) === ((10L, 8L)))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((800000L, 500000L, 600000L)))
    // a duplicate rating by rater a collapses to the MIN label
    val dup = rows :+ ((1L, "a", "z"))
    val rd = Preferences.cohenKappa(dup.toDF("item", "rater", "label"),
      "item", "rater", "label", "a", "b").collect().head
    assert(rd.getLong(0) === 10L && rd.getLong(1) === 8L) // min("x","z")="x"
    // disjoint item sets: zero overlap, null rates, no division blowup
    val disj = Seq((1L, "a", "x"), (2L, "b", "x")).toDF("item", "rater", "label")
    val rn = Preferences.cohenKappa(disj, "item", "rater", "label", "a", "b")
      .collect().head
    assert(rn.getLong(0) === 0L && rn.isNullAt(2) && rn.isNullAt(4))
    // perfect single-label agreement: pe=1, kappa undefined -> null
    val mono = Seq((1L, "a", "x"), (1L, "b", "x"), (2L, "a", "x"), (2L, "b", "x"))
      .toDF("item", "rater", "label")
    val rm = Preferences.cohenKappa(mono, "item", "rater", "label", "a", "b")
      .collect().head
    assert(rm.getLong(2) === 1000000L && rm.getLong(3) === 1000000L && rm.isNullAt(4))
  }

  test("btStrengths: countDiv rescale preserves the ranking") {
    val big = games.union(games).union(games).union(games)
    val a = Preferences.btStrengths(big, "winner", "loser", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val b = Preferences.btStrengths(big, "winner", "loser", iterations = 3, countDiv = 4L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(Seq(1L, 2L, 3L).sortBy(a) === Seq(1L, 2L, 3L).sortBy(b))
    assert(b(1L) === 1000000L)
  }
}
