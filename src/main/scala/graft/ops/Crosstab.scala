package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A3 — weighted crosstab with percent bases and margins
  * (`crosstab_table`, app.py:118-156), plus A9 margins / A10 grand total.
  *
  * Faithful to the reference's exact arithmetic order:
  *  1. pivot rows×cols summing weights, missing cells → 0 (app.py:131);
  *     null row/col keys are dropped (pandas pivot_table dropna).
  *  2. percent matrix from the UNrounded counts with base total|row|col;
  *     zero denominator → null (app.py:133-142); then ROUND (app.py:143).
  *  3. margins on the counts: Total row = column sums, then Total column =
  *     row sums (so the Total row's Total cell = grand total) (app.py:146-147).
  *  4. margins on the pct matrix are sums of the ALREADY-ROUNDED cells,
  *     except the axis that is the percent base, pinned to 100.0
  *     (app.py:148-149).
  *  5. counts and pct stacked vertically with a `__type__` discriminator
  *     ("count" / "%_total" | "%_row" | "%_col") (app.py:150-156).
  *
  * Scale design: the pivot's column values are collected to the driver
  * (bounded by `maxPivotValues` — pandas would OOM far earlier); the
  * grand-total / per-column denominators are 1-row aggregates broadcast
  * via crossJoin, never an empty-frame window, so nothing funnels the
  * full data through one partition. The only full-data shuffle is the
  * single groupBy+pivot hash aggregation (map-side partials apply).
  */
object Crosstab {

  val MaxPivotValues = 10000
  // Hard cap on the collected (row, col) cell grid — grid-sized driver
  // collects are the documented contract here (see scaladoc); beyond
  // this the input is not crosstab-shaped and we fail loudly.
  val MaxCells = 1000000
  // Parity caveat shared with the reference (app.py:146-149): a data value
  // literally named "Total" collides with the margin labels — pandas
  // overwrites that row/column in place; here it yields a duplicate label.
  // Neither engine errors; margins are only unambiguous when the data has
  // no "Total" category.

  def crosstab(
      df: DataFrame,
      rows: String,
      cols: String,
      weightCol: Option[String] = None,
      percent: String = "total", // total | row | col
      includeTotals: Boolean = true,
      decimals: Int = 1): DataFrame = {
    require(Seq("total", "row", "col").contains(percent), s"bad percent base: $percent")
    val w = Cleaning.weightExpr(df, weightCol)

    // pandas pivot_table drops null keys on both axes
    val base = df
      .filter(Cleaning.qcol(rows).isNotNull && Cleaning.qcol(cols).isNotNull)
      .select(Cleaning.qcol(rows).cast("string").as(rows), Cleaning.qcol(cols).cast("string").as(cols), w.as("__w__"))

    // ONE full-data pass: aggregate to (row, col, weight) cells, then
    // COLLECT the grid — it is summary-sized by definition (bounded by
    // category cardinalities, the same contract as Stats.cellGrid and
    // the reference's own margin handling). Everything downstream —
    // pivot, margins, percent denominators — runs over the local frame:
    // no second scan of the fact table and no session-lived persist to
    // leak (the r2 caches here had no owner to release them).
    val cellRows = base
      .groupBy(Cleaning.qcol(rows), Cleaning.qcol(cols))
      .agg(sum(col("__w__")).as("__w__"))
      .limit(MaxCells + 1)
      .collect()
    require(cellRows.length <= MaxCells,
      s"crosstab: >$MaxCells distinct (row, col) cells — not crosstab-shaped columns")
    val cellSeq = cellRows.map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    import df.sparkSession.implicits._
    val cells = cellSeq.toDF(rows, cols, "__w__")

    // Deterministic, bounded pivot column set (sorted ascending like pandas)
    val colVals: Seq[String] = cellSeq.map(_._2).distinct.sorted
    require(colVals.size <= MaxPivotValues,
      s"crosstab: >$MaxPivotValues distinct values in '$cols' — not a crosstab-shaped column")

    val piv = cells
      .groupBy(Cleaning.qcol(rows))
      .pivot(Cleaning.qcol(cols), colVals)
      .agg(sum(col("__w__")))
      // fill_value=0 densification (app.py:131) — explicit coalesce, not
      // na.fill (whose name resolution dot-parses pivot value names)
      .select((Cleaning.qcol(rows) +:
        colVals.map(c => coalesce(Cleaning.qcol(c), lit(0.0)).as(c))): _*)

    val vcols: Seq[Column] = colVals.map(Cleaning.qcol)
    def rowSum(cs: Seq[String]): Column =
      cs.map(c => coalesce(Cleaning.qcol(c), lit(0.0))).reduce(_ + _)

    // ---- percent matrix (null denominators, then round) ----
    // pandas .sum() skips NaN and yields 0.0 even when ALL cells are NaN,
    // so margin sums coalesce null→0.0
    val sumsRow = colVals.map(c => coalesce(sum(Cleaning.qcol(c)), lit(0.0)).as(c))
    val pct: DataFrame = percent match {
      case "row" =>
        val denom = rowSum(colVals)
        piv.select(
          (Cleaning.qcol(rows) +: colVals.map(c =>
            Rounding.halfUp(Cleaning.qcol(c) / when(denom =!= 0, denom) * 100, decimals).as(c))): _*)
      case "col" =>
        val colSums = piv.agg(sumsRow.head, sumsRow.tail: _*)
          .select(colVals.map(c => Cleaning.qcol(c).as(s"__sum_$c")): _*)
        piv.crossJoin(broadcast(colSums)).select(
          (Cleaning.qcol(rows) +: colVals.map(c =>
            Rounding.halfUp(Cleaning.qcol(c) / when(Cleaning.qcol(s"__sum_$c") =!= 0, Cleaning.qcol(s"__sum_$c")) * 100,
              decimals).as(c))): _*)
      case _ => // total
        val grand = piv.agg(colVals.map(c => sum(Cleaning.qcol(c))).reduce(_ + _).as("__grand__"))
        piv.crossJoin(broadcast(grand)).select(
          (Cleaning.qcol(rows) +: colVals.map(c =>
            Rounding.halfUp(Cleaning.qcol(c) / when(col("__grand__") =!= 0, col("__grand__")) * 100,
              decimals).as(c))): _*)
    }

    def withMargins(m: DataFrame, pinRow: Boolean, pinCol: Boolean): DataFrame = {
      val withTotalRow =
        if (pinRow) {
          // percent=row: Total row is 100.0 in every column (app.py:148)
          val one = m.limit(1).select(
            (lit("Total").as(rows) +: colVals.map(c => lit(100.0).as(c))): _*)
          m.unionByName(one)
        } else {
          val tr = m.agg(sumsRow.head, sumsRow.tail: _*)
            .select((lit("Total").as(rows) +: vcols): _*)
          m.unionByName(tr)
        }
      // Total column is computed AFTER the Total row exists (app.py:147,149)
      val totalCol = if (pinCol) lit(100.0) else rowSum(colVals)
      withTotalRow.withColumn("Total", totalCol)
    }

    val (countsM, pctM) =
      if (includeTotals)
        (withMargins(piv, pinRow = false, pinCol = false),
         withMargins(pct, pinRow = percent == "row", pinCol = percent == "col"))
      else (piv, pct)

    countsM.withColumn("__type__", lit("count"))
      .unionByName(pctM.withColumn("__type__", lit(s"%_$percent")))
  }
}
