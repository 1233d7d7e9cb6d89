package graft.bht

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Tabulation

/** BHT table builders (SURVEY.md §3.2): awareness, usage funnel, brand
  * dictionary. Thin domain layer over the generic tabulation operators.
  */
object Builders {

  /** `build_awareness_tables` (app.py:385-417): TOM via value_counts (A1,
    * renamed to brand/count), unaided + aided via selected-counts (A6).
    * Returns only the tables whose source columns exist — same presence
    * rules as the reference.
    */
  def awarenessTables(
      df: DataFrame,
      tom: Option[String],
      unaided: Seq[String],
      aided: Seq[String]): Map[String, DataFrame] = {
    val t = tom.filter(df.columns.contains).map { c =>
      "tom" -> Tabulation.valueCounts(df, c).withColumnRenamed("option", "brand")
    }
    val u = Option(unaided.filter(df.columns.contains)).filter(_.nonEmpty)
      .map(cs => "unaided" -> Tabulation.selectedCounts(df, cs))
    val a = Option(aided.filter(df.columns.contains)).filter(_.nonEmpty)
      .map(cs => "aided" -> Tabulation.selectedCounts(df, cs))
    (t ++ u ++ a).toMap
  }

  /** `build_usage_tables` (app.py:420-434): ever_used / bumo / consider,
    * each a selected-count table (A6).
    */
  def usageTables(
      df: DataFrame,
      everUsed: Seq[String],
      bumo: Seq[String],
      consider: Seq[String]): Map[String, DataFrame] = {
    Seq("ever_used" -> everUsed, "bumo" -> bumo, "consider" -> consider)
      .flatMap { case (name, cols) =>
        val present = cols.filter(df.columns.contains)
        if (present.isEmpty) None
        else Some(name -> Tabulation.selectedCounts(df, present))
      }.toMap
  }

  /** Brand dictionary (app.py:462-476 + 495-503): TOM brands from data
    * values (T10), all other groups from column headers (T7). Long format
    * `(group, brand)` like the exported `brand_dictionary` table.
    */
  def brandDictionary(
      df: DataFrame,
      tom: Option[String],
      groups: Map[String, Seq[String]]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val headerRows: Seq[(String, String)] = groups.toSeq.sortBy(_._1).flatMap {
      case (g, cols) => graft.config.AutoDetect.brandsFromBinaryColumns(cols).map(g -> _)
    }
    val headerDf = headerRows.toDF("group", "brand")
    tom.filter(df.columns.contains) match {
      case Some(c) =>
        Tabulation.distinctValues(df, c)
          .select(lit("TOM").as("group"), col("brand"))
          .unionByName(headerDf)
      case None => headerDf
    }
  }
}
