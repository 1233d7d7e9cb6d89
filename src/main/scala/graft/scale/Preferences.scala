package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-data operators — the RLHF/eval side of a training-data
  * pipeline: a stream of pairwise outcomes (winner item, loser item)
  * from human raters or auto-judges, rolled up to per-item win rates
  * and fixed-iteration Bradley-Terry strengths (Bradley & Terry 1952;
  * the MM update of Hunter 2004, re-expressed as joins+aggregates the
  * way [[Graph.pageRank]] re-expresses power iteration).
  *
  * Determinism contract (the [[Graph]] family's): strengths live in
  * integer MICRO units, every division is integer `div`, and each
  * iteration ends in a max-divisor rescale to 1e6 (the HITS move —
  * overflow-proof and scale-pinning), so a fixed iteration count
  * unrolls in any engine bit-exactly.
  */
object Preferences {

  /** Per-item outcome rollup: (item, wins, losses, games,
    * winrate_micro = wins·1e6 div games). One union + one aggregate.
    *
    * Scale: games shuffle once on the item key; output is |items|
    * rows. */
  def itemStats(
      games: DataFrame, winnerCol: String, loserCol: String): DataFrame = {
    val w = games.select(col(winnerCol).as("item"),
      lit(1L).as("win"))
    val l = games.select(col(loserCol).as("item"),
      lit(0L).as("win"))
    w.union(l)
      .filter(col("item").isNotNull)
      .groupBy(col("item"))
      .agg(sum(col("win")).as("wins"),
        count(lit(1)).as("games"))
      .withColumn("losses", col("games") - col("wins"))
      .withColumn("winrate_micro", expr("(wins * 1000000L) div games"))
      .select(col("item"), col("wins"), col("losses"), col("games"),
        col("winrate_micro"))
  }

  /** Unordered-pair outcome matrix: one row per item pair `a < b` with
    * the game count and a's wins (b's wins = games − wins_a). The
    * input-to-model aggregate of [[btStrengths]], exposed because the
    * pair matrix IS the audit surface (sparsity, coverage, lopsided
    * match-ups).
    *
    * Scale: one aggregate on the canonicalized pair key — |pairs| ≤
    * |items|² rows out, corpus-sized rows in. */
  def pairStats(
      games: DataFrame, winnerCol: String, loserCol: String): DataFrame =
    games
      .select(col(winnerCol).as("w"), col(loserCol).as("l"))
      .filter(col("w").isNotNull && col("l").isNotNull && col("w") =!= col("l"))
      .select(least(col("w"), col("l")).as("item_a"),
        greatest(col("w"), col("l")).as("item_b"),
        when(col("w") < col("l"), 1L).otherwise(0L).as("win_a"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("games"), sum(col("win_a")).as("wins_a"))

  /** Fixed-iteration Bradley-Terry strengths in integer micro units.
    *
    * Model: P(i beats j) = s_i / (s_i + s_j). The MM update (Hunter
    * 2004) with Laplace-smoothed win totals W_i = wins_i + 1 (the
    * smoothing keeps every item's strength strictly positive, so no
    * denominator can hit zero and winless items rank by their
    * opposition rather than collapsing to a degenerate 0 fixed point):
    *
    *   d_i  = Σ_{j : games(i,j)>0}  (n_ij · 1e12) div (s_i + s_j)
    *   s_i' = (W_i · 1e12) div d_i,  then rescale s' to max 1e6
    *
    * Every operand is a long, every step integer division, and the
    * per-iteration max-divisor rescale pins the scale (strengths are
    * only defined up to a constant factor anyway) — bounded magnitudes
    * at any game count, bit-exact in any engine.
    *
    * Scale: the corpus-sized work is the ONE [[pairStats]] aggregate;
    * each iteration then runs on the |pairs|-row matrix — two
    * strength joins on the item key, a per-item aggregate, and a 1-row
    * MAX broadcast. Each iteration references the previous strengths
    * TWICE (s_i and s_j), so the frame is localCheckpointed per
    * iteration — without it the lazy plan doubles per step (the
    * measured HITS lesson, SCALE.md). Output: (item, wins, games,
    * strength_micro).
    *
    * Iteration default: measured, not blind — [[btConvergence]] on the
    * preference fixture shows max per-item movement 443k → 135k → 63k
    * → 39k micro over the first 4 iterations (sf0.01, r11; the
    * `x_pref_bt_delta` key replays the curve), and the RANKING is
    * already identical to the 8-iteration run at 4 (PreferencesSpec
    * gate). Strengths keep drifting ~0.7x per extra iteration — run
    * more when the downstream consumer needs calibrated probabilities
    * rather than an ordering.
    *
    * Overflow contract: with the 1e12 numerator scale, per-pair game
    * counts and per-item smoothed wins must stay below ~9.2e6. BT
    * strengths are invariant under scaling ALL counts by a common
    * factor (d_i and W_i scale together and the ratio cancels), so at
    * corpus scale pass `countDiv` > 1: every pair count and win total
    * is integer-divided by it first (floored at 1 so no pair vanishes)
    * — the standard count-rescale, exact in reals, and the integer
    * rounding it introduces is part of the deterministic replay.
    */
  def btStrengths(
      games: DataFrame, winnerCol: String, loserCol: String,
      iterations: Int = 4, countDiv: Long = 1L): DataFrame = {
    require(iterations >= 1, "btStrengths: need at least one iteration")
    require(countDiv >= 1, "btStrengths: countDiv must be >= 1")
    val (directed, totals) = btSetup(games, winnerCol, loserCol, countDiv)
    var s = totals.select(col("item"), lit(1000000L).as("s_micro"))
    for (_ <- 1 to iterations) s = btStep(directed, totals, s)
    totals.select(col("item"), col("wins"), col("games"))
      .join(s, Seq("item"))
      .withColumnRenamed("s_micro", "strength_micro")
  }

  /** The shared MM inputs, MATERIALIZED once: the lazy forms would
    * re-run the corpus-sized pair/win aggregates on EVERY iteration
    * (each step's `d` join re-evaluates its inputs — only `s` was
    * checkpointed before r11; measured ~2x on the fixture, and at
    * corpus scale it is the difference between one corpus scan and
    * `iterations` of them). Both frames are summary-sized (|pairs|,
    * |items|) so the materialization barrier is metadata-priced.
    */
  private def btSetup(
      games: DataFrame, winnerCol: String, loserCol: String,
      countDiv: Long): (DataFrame, DataFrame) = {
    val pairs = pairStats(games, winnerCol, loserCol)
      .withColumn("games", greatest(expr(s"games div ${countDiv}L"), lit(1L)))
    // directed view: (i, j, n_ij) both ways — d_i sums over opponents
    val directed = pairs.select(
        col("item_a").as("i"), col("item_b").as("j"), col("games").as("n"))
      .union(pairs.select(
        col("item_b").as("i"), col("item_a").as("j"), col("games").as("n")))
      .localCheckpoint()
    val totals = itemStats(
      games.filter(col(winnerCol) =!= col(loserCol)),
      winnerCol, loserCol)
      .select(col("item"), col("wins"), col("games"))
      .withColumn("w_smooth", greatest(expr(s"wins div ${countDiv}L"), lit(0L)) + lit(1L))
      .localCheckpoint()
    (directed, totals)
  }

  /** Wilson score interval on per-item win rates — the confidence
    * band a leaderboard needs before it reorders two items on a
    * handful of games (a raw 3/4 win rate outranks 70/100 without it).
    * Emits [[itemStats]] plus `wilson_lo`/`wilson_hi` at the z given
    * in micro units (default 1.96 — the 95% band).
    *
    * Determinism: p, the interval arithmetic, and the final halfUp 6
    * rounding are ONE fixed IEEE double expression (w, n exact longs;
    * sqrt is correctly rounded per IEEE-754 in any engine), written in
    * the identical shape on the oracle side — the ln-chain precedent.
    *
    * Scale: a row-local projection over the |items|-row [[itemStats]]
    * aggregate — free.
    */
  def winRateWilson(
      games: DataFrame, winnerCol: String, loserCol: String,
      zMicro: Long = 1960000L): DataFrame = {
    require(zMicro > 0, "winRateWilson: zMicro must be positive")
    val z = zMicro.toDouble / 1e6
    val stats = itemStats(games, winnerCol, loserCol)
    val n = col("games").cast("double")
    val p = col("wins").cast("double") / n
    val zz = lit(z) * lit(z)
    val a = p + zz / (lit(2.0) * n)
    val b = sqrt(p * (lit(1.0) - p) / n + zz / (lit(4.0) * (n * n)))
    val den = lit(1.0) + zz / n
    stats
      .withColumn("wilson_lo", graft.ops.Rounding.halfUp((a - lit(z) * b) / den, 6))
      .withColumn("wilson_hi", graft.ops.Rounding.halfUp((a + lit(z) * b) / den, 6))
  }

  /** Cohen's kappa between two raters over a shared item set — the
    * inter-annotator agreement gate an RLHF/eval pipeline runs before
    * trusting a label stream (raw percent agreement overstates quality
    * whenever the label marginals are skewed; kappa subtracts the
    * chance term).
    *
    * Input: one row per (item, rater, label). Duplicate ratings by the
    * same rater collapse to the MIN label (the library's deterministic
    * tie rule). Only items rated by BOTH raters enter the statistic;
    * an empty overlap emits the row with NULL rates (no loud failure —
    * an agreement AUDIT reports, it never throws).
    *
    * Integer-exact: po and pe live in micro units
    * (`agree·1e6 div n`, `Σ_k cA_k·cB_k·1e6 div n²`), and
    * `kappa_micro = (po−pe)·1e6 div (1e6−pe)` — NULL when pe = 1 (a
    * degenerate single-label world has no chance-corrected signal).
    * Output: one row (n_items, n_agree, po_micro, pe_micro,
    * kappa_micro).
    *
    * Scale: one (item, rater) pre-aggregate, one item-keyed self-join
    * of the two rater slices, one |labels|²-bounded marginal join —
    * everything past the first aggregate is label-cardinality-sized.
    * Overflow: cA_k·cB_k·1e6 needs n ≲ 3e6 per label side; divide
    * counts upstream for bigger panels (the BT countDiv move).
    */
  def cohenKappa(
      ratings: DataFrame, itemCol: String, raterCol: String, labelCol: String,
      raterA: String, raterB: String): DataFrame = {
    require(raterA != raterB, "cohenKappa: raters must differ")
    val one = ratings
      .select(col(itemCol).as("item"), col(raterCol).cast("string").as("rater"),
        col(labelCol).cast("string").as("label"))
      .filter(col("item").isNotNull && col("label").isNotNull &&
        (col("rater") === raterA || col("rater") === raterB))
      .groupBy(col("item"), col("rater"))
      .agg(min(col("label")).as("label"))
    val a = one.filter(col("rater") === raterA)
      .select(col("item"), col("label").as("la"))
    val b = one.filter(col("rater") === raterB)
      .select(col("item"), col("label").as("lb"))
    val both = a.join(b, Seq("item"))
    val agg = both.agg(
      count(lit(1)).as("n_items"),
      coalesce(sum(when(col("la") === col("lb"), 1L)), lit(0L)).as("n_agree"))
    val ca = both.groupBy(col("la").as("label")).agg(count(lit(1)).as("ca"))
    val cb = both.groupBy(col("lb").as("label")).agg(count(lit(1)).as("cb"))
    val chance = ca.join(cb, Seq("label"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("cross"))
    agg.crossJoin(broadcast(chance))
      .select(col("n_items"), col("n_agree"),
        when(col("n_items") > 0L,
          expr("(n_agree * 1000000L) div n_items")).as("po_micro"),
        when(col("n_items") > 0L,
          expr("(cross * 1000000L) div (n_items * n_items)")).as("pe_micro"))
      .withColumn("kappa_micro",
        when(col("pe_micro") < 1000000L,
          expr("((po_micro - pe_micro) * 1000000L) div (1000000L - pe_micro)")))
  }

  /** One MM iteration: d-sum on the directed pair matrix, the smoothed
    * win update, and the max-divisor rescale — returning the next
    * (item, s_micro) frame, localCheckpointed.
    *
    * Checkpoint EVERY iteration: the double reference (s_i, s_j)
    * re-executes the whole un-checkpointed segment 2x per step, and
    * the measured every-2nd variant was ~1.6x SLOWER (5.5 s vs 3.4
    * at sf0.1) — the re-executed joins cost more than the saved
    * materialization barriers. Same conclusion as HITS.
    *
    * Floor at 1 micro: the max-divisor rescale truncates an item
    * with s_raw < mx/1e6 to ZERO, and a later pair of two
    * zero-strength items would divide by (si + sj) = 0 — ANSI Spark
    * throws, DuckDB `//` yields NULL, divergent failure under
    * extreme win-rate skew. One micro keeps si + sj > 0 invariant
    * and is below the model's resolution anyway.
    */
  private def btStep(
      directed: DataFrame, totals: DataFrame, s: DataFrame): DataFrame = {
    val d = directed
      .join(s.select(col("item").as("i"), col("s_micro").as("si")), "i")
      .join(s.select(col("item").as("j"), col("s_micro").as("sj")), "j")
      .select(col("i").as("item"),
        expr("(n * 1000000000000L) div (si + sj)").as("term"))
      .groupBy(col("item")).agg(sum(col("term")).as("d"))
    val raw = totals.join(d, Seq("item"))
      .select(col("item"), expr("(w_smooth * 1000000000000L) div d").as("s_raw"))
    val mx = raw.agg(max(col("s_raw")).as("mx"))
    raw.crossJoin(broadcast(mx))
      .select(col("item"),
        expr("greatest((s_raw * 1000000L) div mx, 1L)").as("s_micro"))
      .localCheckpoint()
  }

  /** Per-iteration convergence audit of [[btStrengths]] — the measured
    * curve behind the default iteration count, the [[Graph]] family's
    * GraphProbe evidence re-expressed for preferences: for each MM
    * iteration, the largest absolute strength move across items,
    * `max_i |s_i^t − s_i^{t−1}|`, in micro units. The curve answers
    * "how many iterations does THIS corpus need?" with data instead of
    * a blind constant. Output: (iteration, max_delta_micro).
    *
    * Scale: the same one corpus-sized [[pairStats]] aggregate as
    * [[btStrengths]]; each delta row is ONE |items|-row join+aggregate
    * over frames the checkpointed loop already materialized —
    * iterations·O(|items|) extra work, summary-sized output.
    */
  def btConvergence(
      games: DataFrame, winnerCol: String, loserCol: String,
      iterations: Int = 8, countDiv: Long = 1L): DataFrame = {
    require(iterations >= 1, "btConvergence: need at least one iteration")
    require(countDiv >= 1, "btConvergence: countDiv must be >= 1")
    val (directed, totals) = btSetup(games, winnerCol, loserCol, countDiv)
    var s = totals.select(col("item"), lit(1000000L).as("s_micro"))
    val deltas = (1 to iterations).map { i =>
      val next = btStep(directed, totals, s)
      val row = s.select(col("item"), col("s_micro").as("__prev"))
        .join(next, Seq("item"))
        .agg(max(abs(col("s_micro") - col("__prev"))).as("max_delta_micro"))
        .select(lit(i).as("iteration"), col("max_delta_micro"))
      s = next
      row
    }
    deltas.reduce(_ unionByName _)
  }
}
