package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Disclosure-control operators for releasing survey microdata
  * (beyond-reference): k-anonymity over quasi-identifier combinations.
  * A respondent is re-identifiable when their quasi-identifier combo
  * (age band × region × segment…) is shared by fewer than k rows.
  *
  * Scale: one hash aggregate on the quasi-identifier tuple; suppression
  * is a broadcast anti-join against the (small) risky-combo list.
  */
object Privacy {

  /** Quasi-identifier combos with fewer than `k` rows — the cells a
    * disclosure review must suppress or coarsen. */
  def kAnonymityRisk(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k > 0, "need quasi columns and k > 0")
    df.groupBy(quasiCols.map(Cleaning.qcol): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
  }

  /** One-row release audit: total combos, risky combos, rows at risk,
    * and the smallest cell size. */
  def kAnonymitySummary(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiCols.map(Cleaning.qcol): _*)
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("n") < k, 1L)), lit(0L)).as("n_risky"),
        coalesce(sum(when(col("n") < k, col("n"))), lit(0L)).as("rows_at_risk"),
        min(col("n")).as("min_cell"))

  /** Distinct-l-diversity risk — k-anonymity's blind spot: a cell can
    * hold 30 rows (k-safe) where every row shares the SAME sensitive
    * value, so membership alone discloses it. A quasi-identifier combo
    * is risky when its sensitive attribute takes fewer than `l`
    * distinct non-null values (a cell of only-null sensitive values has
    * diversity 0 — nothing released, nothing disclosed, but it still
    * flags as risky so the review sees it). Output: the risky combos
    * with their row count and diversity.
    *
    * Scale: one hash aggregate on (quasi-tuple) carrying both counts —
    * same shape as [[kAnonymityRisk]].
    */
  def lDiversityRisk(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l > 0, "need quasi columns and l > 0")
    df.groupBy(quasiCols.map(Cleaning.qcol): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(Cleaning.qcol(sensitiveCol)).as("l_distinct"))
      .filter(col("l_distinct") < l)
  }

  /** One-row l-diversity release audit (the [[kAnonymitySummary]]
    * companion): total combos, low-diversity combos, rows at risk, and
    * the smallest diversity seen. */
  def lDiversitySummary(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Long): DataFrame =
    df.groupBy(quasiCols.map(Cleaning.qcol): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(Cleaning.qcol(sensitiveCol)).as("l_distinct"))
      .agg(
        count(lit(1)).as("n_groups"),
        coalesce(sum(when(col("l_distinct") < l, 1L)), lit(0L)).as("n_risky"),
        coalesce(sum(when(col("l_distinct") < l, col("n"))), lit(0L)).as("rows_at_risk"),
        min(col("l_distinct")).as("min_l"))

  /** Suppression: drop every row whose quasi-identifier combo is risky —
    * the released table is k-anonymous by construction.
    *
    * The anti-join is NULL-SAFE (`<=>` per column): kAnonymityRisk groups
    * nulls as ordinary values, so a risky combo containing a missing
    * age/region must still match — plain equality would never match it
    * and would silently release the risky rows. */
  def suppress(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    val risky = kAnonymityRisk(df, quasiCols, k)
      .select(quasiCols.map(c => Cleaning.qcol(c).as(s"__r_$c")): _*)
    val cond = quasiCols.map(c => Cleaning.qcol(c) <=> col(s"__r_$c")).reduce(_ && _)
    df.join(broadcast(risky), cond, "left_anti")
  }
}
