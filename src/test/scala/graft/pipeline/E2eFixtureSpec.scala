package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.config.{AutoDetect, MappingConfig}
import graft.io.Sources
import graft.ops.{Cleaning, Crosstab, MultiDim}

/** End-to-end golden test (SURVEY §5.4, FIXTURES.md §A): full pipeline on
  * the committed survey fixture vs. pandas-computed golden outputs
  * (tools/gen_fixture.py, reference semantics per SURVEY §2 with the
  * documented half-up rounding normalization).
  */
class E2eFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dir = "src/test/resources/survey"
  private lazy val golden: Map[String, Seq[Map[String, Any]]] = {
    implicit val formats: Formats = DefaultFormats
    JsonMethods.parse(new java.io.File(s"$dir/golden.json"))
      .extract[Map[String, Seq[Map[String, Any]]]]
  }
  private lazy val cfg = MappingConfig.load(s"$dir/mapping_config.json")
  private lazy val codebook = Sources.readCodebook(spark, s"$dir/codebook.csv")
  private lazy val raw = Sources.readCsv(spark, s"$dir/wave1.csv")
  private lazy val recoded = Cleaning.applyCodebook(raw, codebook)
  private lazy val tables = Transform.run(raw, cfg, codebook)

  private def rowsOf(df: DataFrame): Seq[Map[String, Any]] =
    df.collect().toSeq.map { r =>
      r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap
    }

  // numeric compare at 1e-6: pandas and Spark accumulate double sums in
  // different orders (last-ulp differences like 62.0 vs 61.999999999999986)
  private def norm(v: Any): String = v match {
    case null | None => "∅"
    case d: Double => (math.rint(d * 1e6) / 1e6).toString
    case f: Float => norm(f.toDouble)
    case n: Number => norm(n.doubleValue())
    case x => x.toString
  }

  private def assertMatches(name: String, df: DataFrame): Unit = {
    val exp = golden(name)
    val got = rowsOf(df)
    assert(got.size == exp.size, s"$name: rows got=${got.size} exp=${exp.size}")
    val canon = (rows: Seq[Map[String, Any]]) =>
      rows.map(_.toSeq.sortBy(_._1).map { case (k, v) => s"$k=${norm(v)}" }.mkString("|")).sorted
    val (g, e) = (canon(got), canon(exp))
    val diff = g.zip(e).filter { case (a, b) => a != b }
    assert(diff.isEmpty, s"$name first diff:\n got ${diff.headOption.map(_._1)}\n exp ${diff.headOption.map(_._2)}")
  }

  test("auto-detect reproduces the committed mapping config exactly") {
    assert(AutoDetect.guessMapping(raw) == cfg)
  }

  test("awareness / usage / KPI / brand-dictionary tables match golden") {
    Seq("awareness_tom", "awareness_unaided", "awareness_aided",
      "usage_ever_used", "usage_bumo", "usage_consider",
      "satisfaction_summary", "nps_summary", "brand_dictionary")
      .foreach(n => assertMatches(n, tables(n)))
  }

  test("full tabulation matches golden (nulls as 'nan', all columns)") {
    assertMatches("tabulation", tables("tabulation"))
  }

  test("crosstab region × gender matches golden for all three percent bases") {
    Seq("total", "row", "col").foreach { mode =>
      assertMatches(s"crosstab_$mode",
        Crosstab.crosstab(recoded, "region", "gender", Some("weight"), mode,
          includeTotals = true, 1))
    }
  }

  test("multi-dim tabulation matches golden (percent by total and by level)") {
    assertMatches("multi_tab_total",
      MultiDim.multiDimTabulation(recoded, Seq("region", "gender", "sec"), Some("weight"), "total", 1))
    assertMatches("multi_tab_region",
      MultiDim.multiDimTabulation(recoded, Seq("region", "gender", "sec"), Some("weight"), "region", 1))
  }
}
