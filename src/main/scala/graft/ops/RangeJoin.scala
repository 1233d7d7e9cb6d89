package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: VALUES matched to INTERVALS [lo, hi] — the
  * operator behind price/score banding, IP→geo lookups, time-slice
  * enrichment. Not in the reference (its pandas banding is a cut());
  * beyond-reference extension, SURVEY.md §7.4a.
  *
  * Spark's native plan for `v BETWEEN lo AND hi` is a
  * BroadcastNestedLoopJoin — every (value, interval) pair is tested,
  * O(|values|×|intervals|) work and an OOM when neither side fits a
  * broadcast. This is the standard BINNED decomposition instead: pick a
  * `binWidth`, explode each interval into the bins it covers
  * (`sequence`), bin each value (`floor(v/w)`), hash equi-join on the
  * bin id, then keep the exact BETWEEN. Work ∝ |values| +
  * Σ(interval length)/w + true matches — shuffle-partitioned on the
  * bin key like any equi-join, AQE skew-splittable when one bin is hot.
  *
  * `binWidth` trades interval replication against bin selectivity: the
  * median interval length is a good default (each interval covers ~2
  * bins). `maxBinsPerInterval` fails FAST (analysis-friendly
  * raise_error, not a silent 10⁶-row explode) when a degenerate
  * interval would cover more bins than that — widen binWidth or split
  * the interval.
  *
  * Semantics (pinned by the j4 oracle): inclusive on both ends;
  * NULL values/bounds never match; an empty interval (lo > hi)
  * matches nothing.
  */
object RangeJoin {

  /** bins whose |index| exceeds this cannot cast to long exactly;
    * doubles this size are whole numbers, so the eventual cast is
    * exact & safe. */
  private val SafeBin = 4.6e18 // < 2^62

  private def dbin(c: Column, binWidth: Double): Column =
    floor(c.cast("double") / binWidth)

  /** The shared interval-side prep: drop empty/NaN intervals, explode
    * each survivor into the bins it covers (guarded raise_error on
    * degenerate spans), leaving one row per (interval, `__bin__`).
    * Both [[rangeJoin]] and [[intervalJoin]] ride this. */
  private def explodeIntervalBins(
      df: DataFrame, lo: Column, hi: Column, binWidth: Double,
      maxBinsPerInterval: Int, opName: String): DataFrame = {
    val safe = lit(SafeBin)
    df
      // empty intervals match nothing (as BETWEEN). NaN bounds: Spark's
      // ORDERING treats NaN = NaN, so `lo <= hi` is TRUE for a
      // (NaN, NaN) interval — filter them out explicitly (a NaN bound
      // can never satisfy an overlap inequality, so dropping it
      // preserves the semantics instead of aborting the job downstream)
      .filter(lo <= hi && !isnan(lo.cast("double")) && !isnan(hi.cast("double")))
      .withColumn("__lobin__", dbin(lo, binWidth))
      .withColumn("__hibin__", dbin(hi, binWidth))
      .withColumn("__bin__", explode(
        // distinct failures get distinct messages: too many bins vs
        // bounds past the long-safe bin range
        when(abs(col("__lobin__")) > safe || abs(col("__hibin__")) > safe,
          raise_error(concat(
            lit(s"$opName: interval bounds bin outside the long-safe range at " +
              s"binWidth=$binWidth — use a larger binWidth (bins "),
            col("__lobin__"), lit(" .. "), col("__hibin__"), lit(")"))))
          .when(col("__hibin__") - col("__lobin__") >= lit(maxBinsPerInterval.toDouble),
            raise_error(concat(
              lit(s"$opName: an interval covers more than $maxBinsPerInterval " +
                s"bins at binWidth=$binWidth ("), col("__hibin__") - col("__lobin__") + 1,
              lit(" bins) — widen binWidth or split the interval"))))
          .otherwise(
            sequence(col("__lobin__").cast("long"), col("__hibin__").cast("long")))))
      .drop("__lobin__", "__hibin__")
  }

  private def requireDisjointColumns(
      a: DataFrame, b: DataFrame, opName: String): Unit = {
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"$opName: the two sides share column names $shared — rename one side")
    val reserved = Set("__bin__", "__vbin__", "__lobin__", "__hibin__")
    require((a.columns ++ b.columns).toSet.intersect(reserved).isEmpty,
      s"$opName: column names $reserved are reserved")
  }

  def rangeJoin(
      values: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double, maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be > 0, got $maxBinsPerInterval")
    // the join output carries both sides' columns, and the BETWEEN
    // filter resolves lo/hi against it — shared names would be
    // ambiguous (or silently clobbered); fail at build time instead
    requireDisjointColumns(values, intervals, "rangeJoin")
    val v = Cleaning.qcol(valueCol)
    val lo = Cleaning.qcol(loCol)
    val hi = Cleaning.qcol(hiCol)
    val binned = explodeIntervalBins(
      intervals, lo, hi, binWidth, maxBinsPerInterval, "rangeJoin")
    // a value binning outside the safe range cannot match any interval
    // that passed the guard — drop it instead of overflowing the cast
    values.withColumn("__vbin__", dbin(v, binWidth))
      .filter(abs(col("__vbin__")) <= lit(SafeBin))
      .withColumn("__bin__", col("__vbin__").cast("long"))
      .drop("__vbin__")
      .join(binned, "__bin__")
      .filter(v >= lo && v <= hi)
      .drop("__bin__")
  }

  /** INTERVAL-overlap join: pairs (a, b) with a.start ≤ b.end AND
    * b.start ≤ a.end — the two-sided complement of [[rangeJoin]]
    * (session-vs-campaign windows, shift-vs-incident overlap,
    * time-range conflation). A raw double-inequality theta-join plans
    * as BroadcastNestedLoop exactly like BETWEEN; the decomposition is
    * the same binned equi-join, with BOTH sides exploded to their
    * covered bins.
    *
    * Each overlapping pair would meet in every bin both intervals
    * cover; the CANONICAL-BIN election keeps the pair only in the
    * first shared bin — `max(floor(a.start/w), floor(b.start/w))` —
    * which both sides of a true overlap provably cover, so every pair
    * emits EXACTLY once with no distinct (the first-shared-bin move;
    * a distinct would shuffle the full duplicated pair stream).
    *
    * Semantics (the [[rangeJoin]] contract, two-sided): closed
    * intervals; NULL bounds never match; an empty interval
    * (start > end) matches nothing; NaN bounds are dropped.
    *
    * Scale: work ∝ Σ(span)/w per side + true matches, shuffled on the
    * bin key; `binWidth` ≈ the median span keeps replication ~2× and
    * the guard fails fast on degenerate spans. Touching intervals
    * (a.end = b.start) land in one shared bin by construction.
    */
  def intervalJoin(
      left: DataFrame, lStartCol: String, lEndCol: String,
      right: DataFrame, rStartCol: String, rEndCol: String,
      binWidth: Double, maxBinsPerInterval: Int = 1024): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be > 0, got $maxBinsPerInterval")
    requireDisjointColumns(left, right, "intervalJoin")
    val (ls, le) = (Cleaning.qcol(lStartCol), Cleaning.qcol(lEndCol))
    val (rs, re) = (Cleaning.qcol(rStartCol), Cleaning.qcol(rEndCol))
    val lb = explodeIntervalBins(
      left, ls, le, binWidth, maxBinsPerInterval, "intervalJoin")
    val rb = explodeIntervalBins(
      right, rs, re, binWidth, maxBinsPerInterval, "intervalJoin")
    lb.join(rb, "__bin__")
      .filter(ls <= re && rs <= le)
      // the canonical first-shared-bin election: exactly-once emission
      .filter(col("__bin__") ===
        greatest(dbin(ls, binWidth), dbin(rs, binWidth)).cast("long"))
      .drop("__bin__")
  }
}
