package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Summary statistics (describe-style) for a numeric column — a natural
  * extension of the reference's KPI surface (beyond-reference, like the
  * §7.4 family). Long format (metric, value).
  *
  * Uses exact `percentile` (sort-based, linear interpolation — the same
  * definition as DuckDB's quantile_cont, so oracle-able); avoids
  * stddev (whose merge order makes the last bits engine-dependent).
  * Scale note: exact percentiles sort per group — for 100 TB inputs
  * prefer `approx_percentile`, which is one pass; exact is the
  * correctness baseline.
  */
object Stats {

  def describe(df: DataFrame, column: String): DataFrame = {
    val c = Cleaning.toNumeric(Cleaning.qcol(column))
    val agged = df.agg(
      count(c).cast("double").as("count"),
      avg(c).as("mean"),
      min(c).as("min"),
      percentile(c, lit(0.25)).as("p25"),
      percentile(c, lit(0.5)).as("p50"),
      percentile(c, lit(0.75)).as("p75"),
      max(c).as("max"))
    val metrics = Seq("count", "mean", "min", "p25", "p50", "p75", "max")
    val pairs = metrics.map(m => struct(lit(m).as("metric"), col(m).cast("double").as("value")))
    agged.select(explode(array(pairs: _*)).as("kv"))
      .select(col("kv.metric").as("metric"), col("kv.value").as("value"))
  }
}
