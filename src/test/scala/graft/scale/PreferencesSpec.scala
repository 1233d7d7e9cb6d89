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
