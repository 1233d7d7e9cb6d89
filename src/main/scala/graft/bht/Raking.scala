package graft.bht

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rim weighting / raking (iterative proportional fitting) — THE survey
  * weighting operator: adjust case weights so the weighted marginals of
  * two demographic dims hit known population targets. The reference
  * consumes a pre-made weight column (SURVEY §2.2 T4) but cannot produce
  * one; any real BHT pipeline rakes.
  *
  * Scale design: the data-sized work is ONE distributed hash aggregate
  * (cell counts over the two dims). IPF itself runs on the driver over
  * the |rows|×|cols| cell table — marginal categories are inherently
  * small (demographic bands), so this is summary-sized arithmetic, the
  * same pattern as the reference's own margin handling. Applying the
  * resulting factors back onto 100 TB of rows is a broadcast join.
  *
  * Determinism contract (for the DuckDB oracle): cell sums use
  * integer-valued weights (exact in doubles); every IPF update is a
  * per-cell scalar formula; marginal sums are accumulated in SORTED
  * category order with left-to-right addition, so an engine mirroring
  * the same textual formula gets bit-identical IEEE results.
  */
object Raking {

  /** @param rowTargets target weighted total per category of `rowCol`
    * @param colTargets target weighted total per category of `colCol`
    *                   (sum must equal rowTargets' sum)
    * @param iters      fixed iteration count (no convergence test — keeps
    *                   the arithmetic identical to the unrolled oracle)
    * @return cell table (rowCol, colCol, weight) — raked weight mass per
    *         cell; per-case factor = weight / original cell count
    */
  def ipfCellWeights(
      df: DataFrame, rowCol: String, colCol: String,
      rowTargets: Map[String, Double], colTargets: Map[String, Double],
      weightCol: Option[String] = None, iters: Int = 5): DataFrame = {
    val spark = df.sparkSession
    val w = graft.ops.Cleaning.weightExpr(df, weightCol)
    val r = graft.ops.Cleaning.qcol(rowCol).cast("string")
    val c = graft.ops.Cleaning.qcol(colCol).cast("string")

    val rowCats = rowTargets.keys.toSeq.sorted
    val colCats = colTargets.keys.toSeq.sorted

    // the only data-sized pass: distributed cell aggregation
    val cellRows = df
      .filter(r.isin(rowCats: _*) && c.isin(colCats: _*))
      .groupBy(r.as("__r"), c.as("__c")).agg(sum(w).as("__w"))
      .collect()
    val cells = scala.collection.mutable.Map[(String, String), Double]()
    for (rc <- rowCats; cc <- colCats) cells((rc, cc)) = 0.0
    cellRows.foreach(row => cells((row.getString(0), row.getString(1))) = row.getDouble(2))

    // IPF: alternately scale rows to rowTargets and columns to colTargets.
    // Marginal sums run over sorted categories, left-to-right — the same
    // order the generated oracle SQL spells out.
    var state = cells.toMap
    for (_ <- 0 until iters) {
      val afterRows = rowCats.flatMap { rc =>
        val rsum = colCats.map(cc => state((rc, cc))).reduceLeft(_ + _)
        val f = if (rsum > 0) rowTargets(rc) / rsum else 0.0
        colCats.map(cc => (rc, cc) -> state((rc, cc)) * f)
      }.toMap
      state = colCats.flatMap { cc =>
        val csum = rowCats.map(rc => afterRows((rc, cc))).reduceLeft(_ + _)
        val f = if (csum > 0) colTargets(cc) / csum else 0.0
        rowCats.map(rc => (rc, cc) -> afterRows((rc, cc)) * f)
      }.toMap
    }

    val out = for (rc <- rowCats; cc <- colCats)
      yield Row(rc, cc, state((rc, cc)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField(rowCol, StringType, nullable = false),
        StructField(colCol, StringType, nullable = false),
        StructField("weight", DoubleType, nullable = false))))
  }

  /** Kish's effective sample size and design effect per group:
    * neff = (Σw)² / Σw², deff = n / neff — the standard diagnostic for
    * how much weighting (raked or otherwise) inflates variance. With
    * integer-valued weights both sums are exact in doubles, so the
    * ratios are engine-deterministic. One hash-aggregate shuffle.
    */
  def effectiveSampleSize(
      df: DataFrame, weightCol: String, groupCols: Seq[String] = Nil): DataFrame = {
    val w = graft.ops.Cleaning.weightExpr(df, Some(weightCol))
    val aggs = Seq(
      count(lit(1)).as("n"),
      (sum(w) * sum(w) / sum(w * w)).as("neff"),
      (count(lit(1)) / (sum(w) * sum(w) / sum(w * w))).as("deff"))
    if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
    else df.groupBy(groupCols.map(graft.ops.Cleaning.qcol): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Attach raked per-case weights to the full row set. Each case's new
    * weight is its ORIGINAL weight scaled by its cell's raking factor
    * (cellTargetMass / cellOriginalMass) — pass the same `weightCol` the
    * fit used so within-cell weight structure is preserved (a cell with
    * design weights {1, 3} and raked mass 8 yields {2, 6}, not {4, 4}).
    * A broadcast join, so this scales to arbitrarily large `df`.
    */
  def applyRake(
      df: DataFrame, rowCol: String, colCol: String,
      cellWeights: DataFrame, weightCol: Option[String] = None,
      weightOut: String = "rake_weight"): DataFrame = {
    val w = graft.ops.Cleaning.weightExpr(df, weightCol)
    val r = graft.ops.Cleaning.qcol(rowCol).cast("string").as("__r")
    val c = graft.ops.Cleaning.qcol(colCol).cast("string").as("__c")
    val mass = df.groupBy(r, c).agg(sum(w).as("__m"))
    val factors = cellWeights
      .select(graft.ops.Cleaning.qcol(rowCol).as("__r"), graft.ops.Cleaning.qcol(colCol).as("__c"),
        col("weight").as("__cw"))
      .join(mass, Seq("__r", "__c"))
      .select(col("__r"), col("__c"),
        (col("__cw") / when(col("__m") =!= 0, col("__m"))).as("__f"))
    df.withColumn("__r", graft.ops.Cleaning.qcol(rowCol).cast("string"))
      .withColumn("__c", graft.ops.Cleaning.qcol(colCol).cast("string"))
      .join(broadcast(factors), Seq("__r", "__c"), "left")
      .withColumn(weightOut, w * col("__f"))
      .drop("__r", "__c", "__f")
  }
}
