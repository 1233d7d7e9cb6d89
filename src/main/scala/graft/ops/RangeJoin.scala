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
    val v = Cleaning.qcol(valueCol)
    val lo = Cleaning.qcol(loCol)
    val hi = Cleaning.qcol(hiCol)
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")

    val binned = intervals
      .filter(lo <= hi) // empty intervals match nothing (as BETWEEN)
      .withColumn("__nbins__", bin(hi) - bin(lo) + 1)
      .withColumn("__bin__", explode(
        when(col("__nbins__") <= maxBinsPerInterval, sequence(bin(lo), bin(hi)))
          .otherwise(raise_error(concat(
            lit(s"rangeJoin: an interval covers more than $maxBinsPerInterval " +
              s"bins at binWidth=$binWidth ("), col("__nbins__"),
            lit(" bins) — widen binWidth or split the interval"))))))
      .drop("__nbins__")

    values.withColumn("__bin__", bin(v))
      .join(binned, "__bin__")
      .filter(v >= lo && v <= hi)
      .drop("__bin__")
  }
}
