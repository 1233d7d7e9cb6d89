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

  /** Event path analysis — the top journeys a product-analytics team
    * reads after the funnel: per user, every consecutive TRIGRAM of
    * event types (ordered by the unique (ts, id) key), counted over
    * the corpus. The output is at most |event_types|³ rows, so no
    * top-k machinery is needed — the full exact table IS
    * summary-sized. Window functions, never a self-join: lead(1) and
    * lead(2) share one user-partitioned pass.
    *
    * Scale: ONE key-partitioned window + one hash aggregate onto a
    * bounded-cardinality key.
    */
  def eventTrigrams(
      events: DataFrame, userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id", typeCol: String = "event_type"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull && col(typeCol).isNotNull)
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("n"))
  }

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
  /** SCD-2 interval build — collapse an event stream into the
    * slowly-changing-dimension form a warehouse serves: one row per
    * (key, value) RUN with its validity interval, instead of one row
    * per event. Consecutive events with the SAME value merge; a value
    * change closes the previous interval at the new event's timestamp
    * and opens the next; the latest interval per key stays open
    * (`valid_to_us` null) — the standard "current row" convention.
    * Ordering is (ts, arrival id) so simultaneous events resolve
    * deterministically; timestamps surface as epoch micros (the
    * engine-parity convention for event time).
    *
    * Scale: two key-partitioned windows (lag to find change points,
    * lead to close intervals) over the events of ONE key at a time —
    * never a global sort; output is change-point-sized, not
    * event-sized.
    */
  def scd2Intervals(
      events: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, arrivalCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = Cleaning.qcol(keyCol)
    val ts = Cleaning.qcol(tsCol)
    val byTime = Window.partitionBy(col("__k"))
      .orderBy(col("__us"), col("__arr"))
    val e = events.filter(k.isNotNull && ts.isNotNull)
      .select(k.as("__k"),
        Cleaning.qcol(valueCol).cast("string").as("__v"),
        unix_micros(ts).as("__us"),
        Cleaning.qcol(arrivalCol).as("__arr"))
    val changes = e
      .withColumn("__prev", lag(col("__v"), 1).over(byTime))
      // null-safe: the first event is always a change point, and a
      // null value differs from a non-null previous (and vice versa)
      .filter(!(col("__v") <=> col("__prev")))
    changes
      .withColumn("__next_us", lead(col("__us"), 1).over(byTime))
      .select(col("__k").as(keyCol), col("__v").as(valueCol),
        col("__us").as("valid_from_us"), col("__next_us").as("valid_to_us"))
  }

  /** Monthly engagement summary — DAU/WAU/MAU's one-table form: per
    * calendar month, the active days, monthly actives (MAU), average
    * daily actives, and the DAU/MAU stickiness ratio every growth
    * report leads with. Calendar fields are exact integers, the two
    * ratios are single double divisions of exact counts (halfUp 6) —
    * engine-exact.
    *
    * Scale: one (day)-keyed distinct aggregate + one (month)-keyed
    * distinct aggregate; both shuffle user ids once, output is
    * months-sized. Swap `countDistinct` for the gated HLL at
    * cardinalities where exact distinct stops being worth it.
    */
  def engagement(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val u = Cleaning.qcol(userCol)
    val ts = Cleaning.qcol(tsCol)
    val e = events.filter(u.isNotNull && ts.isNotNull)
      .select(u.as("__u"),
        year(ts).cast("long").as("__y"), month(ts).cast("long").as("__m"),
        dayofmonth(ts).cast("long").as("__d"))
    val dau = e.groupBy(col("__y"), col("__m"), col("__d"))
      .agg(countDistinct(col("__u")).as("__dau"))
    val mau = e.groupBy(col("__y"), col("__m"))
      .agg(countDistinct(col("__u")).as("mau"))
    dau.groupBy(col("__y"), col("__m"))
      .agg(count(lit(1)).as("n_days"), sum(col("__dau")).as("__sdau"))
      .join(mau, Seq("__y", "__m"))
      .select(
        col("__y").as("year"), col("__m").as("month"),
        col("n_days"), col("mau"),
        Rounding.halfUp(
          col("__sdau").cast("double") / col("n_days"), 6).as("avg_dau"),
        Rounding.halfUp(
          col("__sdau").cast("double") / (col("n_days") * col("mau")), 6)
          .as("stickiness"))
  }

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
