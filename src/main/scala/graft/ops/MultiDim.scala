package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** A4 — multi-dimensional tabulation (`multi_dim_tabulation`,
  * app.py:159-178): group by 1–3 dims with NULL KEYS KEPT
  * (pandas `dropna=False`; Spark groupBy keeps null keys natively),
  * sum weights as count, percent of grand total or percent within one
  * dim's level; unknown percent_by → null pct.
  *
  * Scale: one hash-aggregate shuffle; the within-level percent is a
  * window over the AGGREGATED frame partitioned by a real key (the
  * level), so it distributes; the grand total is a broadcast 1-row agg.
  */
object MultiDim {

  def multiDimTabulation(
      df: DataFrame,
      dims: Seq[String],
      weightCol: Option[String] = None,
      percentBy: String = "total",
      decimals: Int = 1): DataFrame = {
    require(dims.nonEmpty && dims.size <= 3, s"dims must be 1..3, got $dims")
    val w = Cleaning.weightExpr(df, weightCol)
    val grp0 = df
      .groupBy(dims.map(Cleaning.qcol): _*)
      .agg(sum(w).as("count"))
    // summary-sized, read twice when percenting by total
    val grp =
      if (percentBy == "total")
        grp0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else grp0

    if (percentBy == "total") {
      val total = grp.agg(sum(col("count")).as("__total__"))
      grp.crossJoin(broadcast(total))
        .withColumn("pct",
          Rounding.halfUp(col("count") / when(col("__total__") =!= 0, col("__total__")) * 100, decimals))
        .drop("__total__")
    } else if (dims.contains(percentBy)) {
      val denom = sum(col("count")).over(Window.partitionBy(Cleaning.qcol(percentBy)))
      grp.withColumn("pct",
        Rounding.halfUp(col("count") / when(denom =!= 0, denom) * 100, decimals))
    } else {
      grp.withColumn("pct", lit(null).cast("double"))
    }
  }
}
