package graft.config

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AutoDetectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("T7 brand extraction: prefixes/suffixes stripped, separators to spaces") {
    assert(AutoDetect.extractBrandFromColumn("UA_Indomie") == "Indomie")
    assert(AutoDetect.extractBrandFromColumn("consider-sedaap") == "sedaap")
    assert(AutoDetect.extractBrandFromColumn("ever_used_mie_gelas") == "mie gelas")
    // everything stripped → falls back to the raw name
    assert(AutoDetect.extractBrandFromColumn("brand") == "brand")
  }

  test("brandsFromBinaryColumns: distinct + sorted") {
    val got = AutoDetect.brandsFromBinaryColumns(Seq("ua_B", "aa_A", "ua_b_aided"))
    assert(got == Seq("A", "B", "b"))
  }

  test("guess_mapping heuristics on survey-ish headers") {
    val df = Seq.empty[(String, String, String, String, String, String)]
      .toDF("Respondent ID", "gender", "TOM_brand", "ua_brand1", "kepuasan_overall", "nps_score")
    val cfg = AutoDetect.guessMapping(df)
    assert(cfg.respondent_id.contains("Respondent ID"))
    assert(cfg.demographics == Seq("gender"))
    assert(cfg.awareness.tom.contains("TOM_brand"))
    assert(cfg.awareness.unaided == Seq("ua_brand1"))
    assert(cfg.satisfaction.csat.contains("kepuasan_overall"))
    assert(cfg.nps.score.contains("nps_score"))
  }

  test("validate reports columns missing from a new wave") {
    val cfg = MappingConfig(
      respondent_id = Some("rid"),
      awareness = AwarenessCfg(Some("tom"), Seq("ua_x"), Nil))
    val wave = Seq(("1", "b")).toDF("rid", "tom") // ua_x missing
    assert(MappingConfig.validate(cfg, wave) == Seq("awareness.unaided" -> "ua_x"))
    val ok = Seq(("1", "b", "1")).toDF("rid", "tom", "ua_x")
    assert(MappingConfig.validate(cfg, ok).isEmpty)
  }

  test("MappingConfig JSON roundtrip") {
    val cfg = MappingConfig(
      respondent_id = Some("rid"),
      demographics = Seq("age", "gender"),
      awareness = AwarenessCfg(Some("tom"), Seq("u1"), Seq("a1")),
      usage = UsageCfg(Seq("e1"), Nil, Seq("c1")),
      satisfaction = SatisfactionCfg(Some("csat")),
      nps = NpsCfg(Some("nps")))
    assert(MappingConfig.fromJson(MappingConfig.toJson(cfg)) == cfg)
  }
}
