package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort/retention analytics over an event stream — the standard
  * product-analytics rollup (beyond-reference, SURVEY §7.4 events
  * family): users are grouped by the calendar month they FIRST
  * appeared (their cohort), and the matrix counts how many of each
  * cohort are still active k months later. The diagonal fade of that
  * matrix is the retention curve every growth dashboard plots.
  */
object Cohorts {

  /** Retention matrix: one row per (cohort month, month offset) with
    * the distinct active users. Month index is the integer
    * `year·12 + month − 1` — pure integer arithmetic on calendar
    * fields, so any engine derives the identical cohort and offset (no
    * interval/day-count semantics, which differ across engines for
    * month math). Output: (cohort_year, cohort_month, offset_months,
    * n_users); offset 0 is each cohort's full size.
    *
    * Scale: one per-user min aggregate (shuffles user ids once), an
    * id-keyed join back (co-partitioned on the user key), and one
    * (cohort, offset)-keyed distinct-count — months × months groups,
    * summary-sized. For month counts beyond exact-distinct comfort,
    * swap the epilogue's `countDistinct` for the gated HLL
    * ([[Stats.approxDistinct]]) — same frame, sketch state.
    */
  def retentionMatrix(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val u = Cleaning.qcol(userCol)
    val ts = Cleaning.qcol(tsCol)
    val ev = events.filter(u.isNotNull && ts.isNotNull)
      .select(u.as("__u"), (year(ts) * 12 + month(ts) - 1).cast("long").as("__m"))
    val cohorts = ev.groupBy(col("__u")).agg(min(col("__m")).as("__c"))
    ev.join(cohorts, Seq("__u"))
      .groupBy(col("__c"), (col("__m") - col("__c")).as("offset_months"))
      .agg(countDistinct(col("__u")).as("n_users"))
      .select(
        floor(col("__c") / 12).cast("long").as("cohort_year"),
        (pmod(col("__c"), lit(12L)) + 1).cast("long").as("cohort_month"),
        col("offset_months"), col("n_users"))
  }
}
