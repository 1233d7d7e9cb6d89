package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.config.MappingConfig
import graft.io.Sources
import graft.ops.{AsOf, Cleaning, Crosstab, MultiDim, Rounding, Stats, Tabulation}
import graft.bht.{Builders, Kpis, Raking}
import graft.pipeline.Transform
import graft.scale.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import graft.streaming.Streams
import EntryShared._

/** [[SparkEntry]] slice: preference aggregation (Bradley-Terry, agreement), privacy releases, QC contracts.
  * Query lambdas and their DuckDB oracle mirrors live side by side;
  * the maps compose into the driver contract in [[SparkEntry]].
  * Determinism rules documented there apply to every entry.
  */
private[graft] object QueriesAudits {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- preference data / Bradley-Terry (round-10) -------------------
    // per-item outcome rollup over the derived pairwise-judgment view
    "x_pref_winrate" -> ((s, d) =>
      graft.scale.Preferences.itemStats(preferenceGames(s, d), "winner", "loser")),

    // fixed-iteration Bradley-Terry strengths in integer micro units
    // (4 MM iterations, max-divisor rescale each round — the oracle
    // unrolls the identical arithmetic as a materialized CTE chain)
    "x_pref_bt" -> ((s, d) =>
      graft.scale.Preferences.btStrengths(preferenceGames(s, d), "winner", "loser",
        iterations = 4)),

    // the convergence curve behind the iteration-count default: max
    // per-item strength move per MM iteration — 6 iterations to show
    // the tail past the production 4
    "x_pref_bt_delta" -> ((s, d) =>
      graft.scale.Preferences.btConvergence(preferenceGames(s, d), "winner", "loser",
        iterations = 6)),

    // Wilson 95% band on the win rates — the leaderboard's
    // reorder-with-confidence guard
    "x_pref_wilson" -> ((s, d) =>
      graft.scale.Preferences.winRateWilson(preferenceGames(s, d), "winner", "loser")),

    // two-rater agreement over a derived rating view: rater a = lang,
    // rater b = lang with every 7th doc mislabeled — kappa < 1 by
    // construction, chance term exact
    "x_pref_kappa" -> ((s, d) =>
      graft.scale.Preferences.cohenKappa(
        raterFixture(s, d), "item", "rater", "label", "a", "b")),

    // seeded Laplace release counts per source (ε = 0.5): the DP
    // mechanism's full data path with the secure RNG swapped for the
    // portable hash so the gate can replay it (documented trade)
    // non-default releaseSalt on purpose: the oracle replays a SECOND
    // release's fresh noise, proving salted draws are engine-exact too
    "x_priv_dpcounts" -> ((s, d) =>
      graft.ops.Privacy.dpNoisyCounts(T(s, d, "documents"), "source",
        epsilonMicro = 500000L, releaseSalt = "release-2")),

    // referential-integrity contract audit over PLANTED violations
    // (the FK-consistent TPC-H tables would make the gate vacuous):
    // customers thinned 10% -> orphan orders; every 13th order's
    // custkey nulled -> null-key counter; orders thinned 1/7 ->
    // orphan lineitems
    "x_qc_refint" -> ((s, d) => {
      val cust = T(s, d, "customer").filter(col("c_custkey") % 10 =!= 0)
      val ordersNulled = T(s, d, "orders").withColumn("o_custkey",
        when(col("o_orderkey") % 13 === 0, lit(null)).otherwise(col("o_custkey")))
      val ordersThinned = T(s, d, "orders").filter(col("o_orderkey") % 7 =!= 0)
      graft.ops.Contracts.referentialAudit(
          ordersNulled, "o_custkey", cust, "c_custkey", "orders->customer")
        .union(graft.ops.Contracts.referentialAudit(
          T(s, d, "lineitem"), "l_orderkey", ordersThinned, "o_orderkey",
          "lineitem->orders"))
    }),

    // id-sequence completeness: TPC-H orderkeys are sparse BY DESIGN
    // (real gap signal, no plant needed); event ids are the dense
    // counter-example
    "x_qc_gaps" -> ((s, d) =>
      graft.ops.Contracts.sequenceGapAudit(T(s, d, "orders"), "o_orderkey", "orders.o_orderkey")
        .union(graft.ops.Contracts.sequenceGapAudit(T(s, d, "events"), "event_id", "events.event_id"))),

    // uniqueness on a view with PLANTED dupes (every 10th order row
    // appears twice) and planted null keys (every 97th orderkey)
    "x_qc_unique" -> ((s, d) =>
      graft.ops.Contracts.uniquenessAudit(
        qcDupedOrders(s, d), Seq("k1", "k2"), "orders.pk")),

    // accepted-values: 'error' is outside the allowed domain (a real
    // violation in the data, no plant needed); nulls planted separately
    "x_qc_enum" -> ((s, d) =>
      graft.ops.Contracts.enumDomainAudit(
        T(s, d, "events").withColumn("event_type",
          when(col("event_id") % 101 === 0, lit(null))
            .otherwise(col("event_type"))),
        "event_type", Seq("click", "view", "signup", "purchase"),
        "events.event_type")),

    // accepted-range on quantity: [5, 45] against the natural 1..50
    // domain — violations on both sides
    "x_qc_range" -> ((s, d) =>
      graft.ops.Contracts.rangeAudit(
        T(s, d, "lineitem"), "l_quantity", 5L, 45L, "lineitem.l_quantity")),

    // freshness vs the fixed as-of (2024-02-01T00:00:00Z): one rule
    // inside its lag budget, one stale — both rows from one aggregate
    // shape, the as-of passed in (never read from a clock)
    "x_qc_fresh" -> ((s, d) =>
      graft.ops.Contracts.freshnessAudit(
          T(s, d, "events"), "ts", QcAsOfEpochUs, 7L * 86400L, "events.ts.weekly")
        .union(graft.ops.Contracts.freshnessAudit(
          T(s, d, "events"), "ts", QcAsOfEpochUs, 3600L, "events.ts.hourly"))),

    // the composed delivery report: every contract normalized to
    // (rule, n_rows, n_violations) and unioned — the one-glance gate a
    // delivery pipeline actually pages on
    "x_qc_report" -> ((s, d) => qcDeliveryReport(s, d)),
  )

  val oracleSql: Map[String, String] = Map(

    // per-item win/loss rollup over the derived preference view
    "x_pref_winrate" ->
      (s"WITH $prefGamesSql," +
        """
          |wl AS (SELECT winner AS item, 1 AS win FROM games
          |       UNION ALL SELECT loser, 0 FROM games)
          |SELECT item, CAST(sum(win) AS BIGINT) AS wins,
          |       CAST(count(*) - sum(win) AS BIGINT) AS losses,
          |       CAST(count(*) AS BIGINT) AS games,
          |       CAST((sum(win) * 1000000) // count(*) AS BIGINT) AS winrate_micro
          |FROM wl GROUP BY 1""".stripMargin),

    // Bradley-Terry: the 4-iteration MM chain unrolled — every step
    // references the previous strengths twice (s_i and s_j) plus the
    // scalar MAX divisor, so each CTE is MATERIALIZED (the HITS
    // lesson: default inlining is exponential in the chain depth)
    "x_pref_bt" ->
      (btOracleCtes(4) +
        """
          |SELECT t.item, t.wins, t.games, s4.s AS strength_micro
          |FROM totals t JOIN s4 USING (item)""".stripMargin),

    // per-iteration max strength move over the same unrolled chain —
    // one delta row per adjacent (s_{i-1}, s_i) CTE pair
    "x_pref_bt_delta" ->
      (btOracleCtes(6) + "\n" +
        (1 to 6).map { i =>
          s"""SELECT CAST($i AS INT) AS iteration,
             |       CAST(max(abs(a.s - b.s)) AS BIGINT) AS max_delta_micro
             |FROM s$i a JOIN s${i - 1} b USING (item)""".stripMargin
        }.mkString("\nUNION ALL\n")),

    // Wilson band: identical double expression shape both engines
    // (1.96 literal round-trips to the same IEEE double; sqrt is
    // correctly rounded everywhere), halfUp 6 like every double output
    "x_pref_wilson" ->
      (s"WITH $prefGamesSql," +
        s"""
          |wl AS (SELECT winner AS item, 1 AS win FROM games
          |       UNION ALL SELECT loser, 0 FROM games),
          |t AS (SELECT item, CAST(sum(win) AS BIGINT) AS wins,
          |        CAST(count(*) - sum(win) AS BIGINT) AS losses,
          |        CAST(count(*) AS BIGINT) AS games,
          |        CAST((sum(win) * 1000000) // count(*) AS BIGINT) AS winrate_micro
          |      FROM wl GROUP BY 1),
          |w AS (SELECT *, CAST(wins AS DOUBLE) / CAST(games AS DOUBLE) AS p,
          |        CAST(games AS DOUBLE) AS nn FROM t)
          |SELECT item, wins, losses, games, winrate_micro,
          |  ${Rounding.halfUpSql("(p + (1.96*1.96)/(2.0*nn) - 1.96 * sqrt(p*(1.0-p)/nn + (1.96*1.96)/(4.0*(nn*nn)))) / (1.0 + (1.96*1.96)/nn)", 6)} AS wilson_lo,
          |  ${Rounding.halfUpSql("(p + (1.96*1.96)/(2.0*nn) + 1.96 * sqrt(p*(1.0-p)/nn + (1.96*1.96)/(4.0*(nn*nn)))) / (1.0 + (1.96*1.96)/nn)", 6)} AS wilson_hi
          |FROM w""".stripMargin),

    // Cohen's kappa over the derived two-rater view; kappa division
    // replays Spark's truncate-toward-zero div via the sign-factored
    // form (negative kappa is possible in general)
    "x_pref_kappa" ->
      """WITH r AS (SELECT doc_id AS item, 'a' AS rater, lang AS label FROM documents
        |           UNION ALL
        |           SELECT doc_id, 'b',
        |                  CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END
        |           FROM documents),
        |one AS (SELECT item, rater, min(label) AS label FROM r
        |        WHERE item IS NOT NULL AND label IS NOT NULL GROUP BY 1, 2),
        |bth AS (SELECT a.item, a.label AS la, b.label AS lb
        |        FROM (SELECT item, label FROM one WHERE rater = 'a') a
        |        JOIN (SELECT item, label FROM one WHERE rater = 'b') b USING (item)),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |          CAST(coalesce(sum(CASE WHEN la = lb THEN 1 END), 0) AS BIGINT) AS n_agree
        |        FROM bth),
        |ca AS (SELECT la AS label, CAST(count(*) AS BIGINT) AS ca FROM bth GROUP BY 1),
        |cb AS (SELECT lb AS label, CAST(count(*) AS BIGINT) AS cb FROM bth GROUP BY 1),
        |ch AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS crs
        |       FROM ca JOIN cb USING (label)),
        |po AS (SELECT n_items, n_agree,
        |         CASE WHEN n_items > 0
        |           THEN CAST((n_agree * 1000000) // n_items AS BIGINT) END AS po_micro,
        |         CASE WHEN n_items > 0
        |           THEN CAST((crs * 1000000) // (n_items * n_items) AS BIGINT) END AS pe_micro
        |       FROM agg, ch)
        |SELECT n_items, n_agree, po_micro, pe_micro,
        |       CASE WHEN pe_micro >= 1000000 THEN NULL
        |            WHEN po_micro >= pe_micro
        |              THEN CAST(((po_micro - pe_micro) * 1000000) // (1000000 - pe_micro) AS BIGINT)
        |            ELSE CAST(-(((pe_micro - po_micro) * 1000000) // (1000000 - pe_micro)) AS BIGINT)
        |       END AS kappa_micro
        |FROM po""".stripMargin,

    // seeded Laplace counts: poly-hash -> affine -> centered uniform ->
    // inverse CDF, every float op in the same order as the Scala side;
    // the single ln per group is floor-micro-rounded (entropy precedent).
    // chr(31) mirrors the Scala side's U+001F group/salt domain separator
    "x_priv_dpcounts" ->
      s"""WITH c AS (SELECT source AS "group", CAST(count(*) AS BIGINT) AS n
         |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
         |h AS (SELECT *, ((${polyHashSqlOf("\"group\" || chr(31) || 'release-2'")} % 1000003) * 514229 + 741103) % 1000003 AS hv
         |      FROM c),
         |u AS (SELECT *, (CAST(hv AS DOUBLE) + 0.5) / 1000003.0 - 0.5 AS cdev FROM h),
         |z AS (SELECT *, CAST(floor((((-2.0) * sign(cdev)) * ln(1.0 - 2.0 * abs(cdev)))
         |        * 1000000.0 + 0.5) AS BIGINT) AS noise_micro FROM u)
         |SELECT "group", n, noise_micro,
         |       CAST(n * 1000000 + noise_micro AS BIGINT) AS noisy_count_micro,
         |       CAST(500000 AS BIGINT) AS epsilon_micro
         |FROM z""".stripMargin,

    // referential contract audit over the planted violations: distinct
    // parent keys left-joined under the child, three counters per rule
    "x_qc_refint" ->
      """WITH cust AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 10 <> 0),
        |o AS (SELECT CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE o_custkey END AS fk
        |      FROM orders),
        |r1 AS (SELECT 'orders->customer' AS rule, CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(coalesce(sum(CASE WHEN o.fk IS NULL THEN 1 END), 0) AS BIGINT) AS n_null_keys,
        |    CAST(coalesce(sum(CASE WHEN o.fk IS NOT NULL AND cust.c_custkey IS NULL THEN 1 END), 0) AS BIGINT) AS n_orphans
        |  FROM o LEFT JOIN cust ON o.fk = cust.c_custkey),
        |ord2 AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0),
        |r2 AS (SELECT 'lineitem->orders' AS rule, CAST(count(*) AS BIGINT) AS n_child,
        |    CAST(coalesce(sum(CASE WHEN l.l_orderkey IS NULL THEN 1 END), 0) AS BIGINT) AS n_null_keys,
        |    CAST(coalesce(sum(CASE WHEN l.l_orderkey IS NOT NULL AND ord2.o_orderkey IS NULL THEN 1 END), 0) AS BIGINT) AS n_orphans
        |  FROM lineitem l LEFT JOIN ord2 ON l.l_orderkey = ord2.o_orderkey)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2""".stripMargin,

    // id-sequence completeness: span - distinct = missing ids
    "x_qc_gaps" ->
      """WITH a AS (SELECT 'orders.o_orderkey' AS rule,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
        |    CAST(min(o_orderkey) AS BIGINT) AS min_id,
        |    CAST(max(o_orderkey) AS BIGINT) AS max_id
        |  FROM orders WHERE o_orderkey IS NOT NULL),
        |b AS (SELECT 'events.event_id' AS rule,
        |    CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |    CAST(min(event_id) AS BIGINT) AS min_id,
        |    CAST(max(event_id) AS BIGINT) AS max_id
        |  FROM events WHERE event_id IS NOT NULL),
        |u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
        |SELECT rule, n_rows, n_distinct, min_id, max_id,
        |       CAST(max_id - min_id + 1 - n_distinct AS BIGINT) AS n_missing,
        |       CAST(n_rows - n_distinct AS BIGINT) AS n_dupes
        |FROM u""".stripMargin,

    // uniqueness over the planted-dup view (every 10th row twice,
    // every 97th key nulled) — per-key counts then one summary
    "x_qc_unique" ->
      s"""WITH $qcDupedOrdersSql,
         |pk AS (SELECT (k1 IS NULL OR k2 IS NULL) AS isn, k1, k2,
         |              CAST(count(*) AS BIGINT) AS c
         |       FROM v GROUP BY 1, 2, 3)
         |SELECT 'orders.pk' AS rule,
         |  CAST(coalesce(sum(c), 0) AS BIGINT) AS n_rows,
         |  CAST(coalesce(sum(CASE WHEN isn THEN c END), 0) AS BIGINT) AS n_null_keys,
         |  CAST(coalesce(sum(CASE WHEN NOT isn THEN 1 END), 0) AS BIGINT) AS n_distinct,
         |  CAST(coalesce(sum(CASE WHEN NOT isn AND c > 1 THEN 1 END), 0) AS BIGINT) AS n_dupe_keys,
         |  CAST(coalesce(sum(CASE WHEN NOT isn THEN c - 1 END), 0) AS BIGINT) AS n_dupe_rows
         |FROM pk""".stripMargin,

    // accepted-values: per-value counts then one summary; min_invalid
    // is the deterministic witness
    "x_qc_enum" ->
      """WITH e AS (SELECT CASE WHEN event_id % 101 = 0 THEN NULL
        |                       ELSE event_type END AS v FROM events),
        |pv AS (SELECT v, CAST(count(*) AS BIGINT) AS c,
        |         (v IS NOT NULL AND
        |          v NOT IN ('click', 'view', 'signup', 'purchase')) AS bad
        |       FROM e GROUP BY 1)
        |SELECT 'events.event_type' AS rule,
        |  CAST(coalesce(sum(c), 0) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(CASE WHEN v IS NULL THEN c END), 0) AS BIGINT) AS n_null,
        |  CAST(coalesce(sum(CASE WHEN bad THEN c END), 0) AS BIGINT) AS n_invalid,
        |  CAST(coalesce(sum(CASE WHEN bad THEN 1 END), 0) AS BIGINT) AS n_invalid_values,
        |  min(CASE WHEN bad THEN v END) AS min_invalid
        |FROM pv""".stripMargin,

    // accepted-range on the integral-valued quantity (floor == Spark's
    // truncating cast for these non-negative integral doubles)
    "x_qc_range" ->
      """SELECT 'lineitem.l_quantity' AS rule,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(coalesce(sum(CASE WHEN l_quantity IS NULL THEN 1 END), 0) AS BIGINT) AS n_null,
        |  CAST(coalesce(sum(CASE WHEN CAST(floor(l_quantity) AS BIGINT) < 5 THEN 1 END), 0) AS BIGINT) AS n_below,
        |  CAST(coalesce(sum(CASE WHEN CAST(floor(l_quantity) AS BIGINT) > 45 THEN 1 END), 0) AS BIGINT) AS n_above,
        |  CAST(min(floor(l_quantity)) AS BIGINT) AS min_v,
        |  CAST(max(floor(l_quantity)) AS BIGINT) AS max_v
        |FROM lineitem""".stripMargin,

    // freshness vs the fixed as-of literal; lag replays Spark's
    // truncating div via the sign-factored // form
    "x_qc_fresh" ->
      s"""WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |             CAST(max(epoch_us(ts)) AS BIGINT) AS max_epoch_us
         |           FROM events),
         |l AS (SELECT *,
         |        CAST(CASE WHEN $QcAsOfEpochUs - max_epoch_us >= 0
         |               THEN ($QcAsOfEpochUs - max_epoch_us) // 1000000
         |               ELSE -((max_epoch_us - $QcAsOfEpochUs) // 1000000)
         |             END AS BIGINT) AS lag_s
         |      FROM m)
         |SELECT 'events.ts.weekly' AS rule, n_rows, max_epoch_us, lag_s,
         |       coalesce(lag_s <= ${7L * 86400L}, false) AS is_fresh FROM l
         |UNION ALL
         |SELECT 'events.ts.hourly' AS rule, n_rows, max_epoch_us, lag_s,
         |       coalesce(lag_s <= 3600, false) AS is_fresh FROM l""".stripMargin,

    // the composed report: every contract's (rule, n_rows,
    // n_violations) normalization unioned
    "x_qc_report" ->
      s"""WITH $qcDupedOrdersSql,
         |pk AS (SELECT (k1 IS NULL OR k2 IS NULL) AS isn, k1, k2,
         |              CAST(count(*) AS BIGINT) AS c
         |       FROM v GROUP BY 1, 2, 3),
         |refp AS (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey IS NOT NULL),
         |refint AS (SELECT 'orders->customer' AS rule,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(coalesce(sum(CASE WHEN o.o_custkey IS NULL THEN 1 END), 0) +
         |         coalesce(sum(CASE WHEN o.o_custkey IS NOT NULL AND refp.c_custkey IS NULL THEN 1 END), 0) AS BIGINT) AS n_violations
         |  FROM orders o LEFT JOIN refp ON o.o_custkey = refp.c_custkey),
         |gaps AS (SELECT 'events.event_id' AS rule,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST((max(event_id) - min(event_id) + 1 - count(DISTINCT event_id)) +
         |         (count(*) - count(DISTINCT event_id)) AS BIGINT) AS n_violations
         |  FROM events WHERE event_id IS NOT NULL),
         |uniq AS (SELECT 'orders.pk' AS rule,
         |    CAST(coalesce(sum(c), 0) AS BIGINT) AS n_rows,
         |    CAST(coalesce(sum(CASE WHEN isn THEN c END), 0) +
         |         coalesce(sum(CASE WHEN NOT isn THEN c - 1 END), 0) AS BIGINT) AS n_violations
         |  FROM pk),
         |enums AS (SELECT 'events.event_type' AS rule,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(coalesce(sum(CASE WHEN event_type IS NULL THEN 1 END), 0) +
         |         coalesce(sum(CASE WHEN event_type IS NOT NULL AND
         |           event_type NOT IN ('click', 'view', 'signup', 'purchase') THEN 1 END), 0) AS BIGINT) AS n_violations
         |  FROM events),
         |rng AS (SELECT 'lineitem.l_quantity' AS rule,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(coalesce(sum(CASE WHEN l_quantity IS NULL THEN 1 END), 0) +
         |         coalesce(sum(CASE WHEN CAST(floor(l_quantity) AS BIGINT) < 5 THEN 1 END), 0) +
         |         coalesce(sum(CASE WHEN CAST(floor(l_quantity) AS BIGINT) > 45 THEN 1 END), 0) AS BIGINT) AS n_violations
         |  FROM lineitem),
         |fr AS (SELECT 'events.ts.hourly' AS rule,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CASE WHEN coalesce(
         |           CAST(CASE WHEN $QcAsOfEpochUs - max(epoch_us(ts)) >= 0
         |                  THEN ($QcAsOfEpochUs - max(epoch_us(ts))) // 1000000
         |                  ELSE -((max(epoch_us(ts)) - $QcAsOfEpochUs) // 1000000)
         |                END AS BIGINT) <= 3600, false)
         |         THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS n_violations
         |  FROM events)
         |SELECT * FROM refint UNION ALL SELECT * FROM gaps
         |UNION ALL SELECT * FROM uniq UNION ALL SELECT * FROM enums
         |UNION ALL SELECT * FROM rng UNION ALL SELECT * FROM fr""".stripMargin,
  )
}
