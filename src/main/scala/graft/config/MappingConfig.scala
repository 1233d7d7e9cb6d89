package graft.config

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** The reference's reusable mapping config (app.py:354-361, 65-72):
  * a declarative description of which columns carry which BHT concept.
  * S4 (JSON load, app.py:188-191) / S7 (JSON save, app.py:363-374) are
  * driver-side codecs — no Spark involvement.
  */
case class AwarenessCfg(
    tom: Option[String] = None,
    unaided: Seq[String] = Nil,
    aided: Seq[String] = Nil)

case class UsageCfg(
    ever_used: Seq[String] = Nil,
    bumo: Seq[String] = Nil,
    consider: Seq[String] = Nil)

case class SatisfactionCfg(csat: Option[String] = None)
case class NpsCfg(score: Option[String] = None)

case class MappingConfig(
    respondent_id: Option[String] = None,
    demographics: Seq[String] = Nil,
    awareness: AwarenessCfg = AwarenessCfg(),
    usage: UsageCfg = UsageCfg(),
    satisfaction: SatisfactionCfg = SatisfactionCfg(),
    nps: NpsCfg = NpsCfg())

object MappingConfig {
  implicit private val formats: Formats = DefaultFormats

  /** All column names the config references, with their concept slot. */
  def referencedColumns(cfg: MappingConfig): Seq[(String, String)] =
    cfg.respondent_id.map("respondent_id" -> _).toSeq ++
      cfg.demographics.map("demographics" -> _) ++
      cfg.awareness.tom.map("awareness.tom" -> _).toSeq ++
      cfg.awareness.unaided.map("awareness.unaided" -> _) ++
      cfg.awareness.aided.map("awareness.aided" -> _) ++
      cfg.usage.ever_used.map("usage.ever_used" -> _) ++
      cfg.usage.bumo.map("usage.bumo" -> _) ++
      cfg.usage.consider.map("usage.consider" -> _) ++
      cfg.satisfaction.csat.map("satisfaction.csat" -> _).toSeq ++
      cfg.nps.score.map("nps.score" -> _).toSeq

  /** Schema-drift check for reusing a saved config on a new wave:
    * returns the (slot, column) entries missing from the DataFrame.
    * Empty result = the wave is structurally compatible. (The builders
    * themselves skip missing columns, like the reference — this makes
    * the drift VISIBLE instead of silent.)
    */
  def validate(cfg: MappingConfig, df: org.apache.spark.sql.DataFrame): Seq[(String, String)] = {
    val present = df.columns.toSet
    referencedColumns(cfg).filterNot { case (_, c) => present.contains(c) }
  }

  def fromJson(json: String): MappingConfig =
    JsonMethods.parse(json).extract[MappingConfig]

  def toJson(cfg: MappingConfig): String =
    Serialization.writePretty(cfg)

  def load(path: String): MappingConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def save(cfg: MappingConfig, path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), toJson(cfg).getBytes("UTF-8"))
}
