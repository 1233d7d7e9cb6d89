package graft.ops

import org.apache.spark.sql.DataFrame
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
    val shared = values.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"rangeJoin: values and intervals share column names $shared — rename one side")
    val reserved = Set("__bin__", "__vbin__", "__lobin__", "__hibin__")
    require((values.columns ++ intervals.columns).toSet.intersect(reserved).isEmpty,
      s"rangeJoin: column names $reserved are reserved")
    val v = Cleaning.qcol(valueCol)
    val lo = Cleaning.qcol(loCol)
    val hi = Cleaning.qcol(hiCol)
    // bin indexes in DOUBLE first: comparisons and the bin-count guard
    // run BEFORE any long cast, so an extreme bound reaches the clear
    // raise_error message instead of an ANSI CAST_OVERFLOW (and with
    // ANSI off, a saturated cast can't wrap __nbins__ negative past
    // the guard). |bin| <= 2^62 makes the eventual cast exact & safe.
    def dbin(c: org.apache.spark.sql.Column) = floor(c.cast("double") / binWidth)
    val safe = lit(4.6e18) // < 2^62; doubles this size are whole numbers

    val binned = intervals
      // empty intervals match nothing (as BETWEEN). NaN bounds: Spark's
      // ORDERING treats NaN = NaN, so `lo <= hi` is TRUE for a
      // (NaN, NaN) interval — filter them out explicitly (a NaN bound
      // can never satisfy v >= lo && v <= hi, so dropping it preserves
      // BETWEEN semantics instead of aborting the job downstream)
      .filter(lo <= hi && !isnan(lo.cast("double")) && !isnan(hi.cast("double")))
      .withColumn("__lobin__", dbin(lo))
      .withColumn("__hibin__", dbin(hi))
      .withColumn("__bin__", explode(
        // distinct failures get distinct messages: too many bins vs
        // bounds past the long-safe bin range
        when(abs(col("__lobin__")) > safe || abs(col("__hibin__")) > safe,
          raise_error(concat(
            lit(s"rangeJoin: interval bounds bin outside the long-safe range at " +
              s"binWidth=$binWidth — use a larger binWidth (bins "),
            col("__lobin__"), lit(" .. "), col("__hibin__"), lit(")"))))
          .when(col("__hibin__") - col("__lobin__") >= lit(maxBinsPerInterval.toDouble),
            raise_error(concat(
              lit(s"rangeJoin: an interval covers more than $maxBinsPerInterval " +
                s"bins at binWidth=$binWidth ("), col("__hibin__") - col("__lobin__") + 1,
              lit(" bins) — widen binWidth or split the interval"))))
          .otherwise(
            sequence(col("__lobin__").cast("long"), col("__hibin__").cast("long")))))
      .drop("__lobin__", "__hibin__")

    // a value binning outside the safe range cannot match any interval
    // that passed the guard — drop it instead of overflowing the cast
    values.withColumn("__vbin__", dbin(v))
      .filter(abs(col("__vbin__")) <= safe)
      .withColumn("__bin__", col("__vbin__").cast("long"))
      .drop("__vbin__")
      .join(binned, "__bin__")
      .filter(v >= lo && v <= hi)
      .drop("__bin__")
  }
}
