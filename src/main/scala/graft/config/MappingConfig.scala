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

  def fromJson(json: String): MappingConfig =
    JsonMethods.parse(json).extract[MappingConfig]

  def toJson(cfg: MappingConfig): String =
    Serialization.writePretty(cfg)

  def load(path: String): MappingConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def save(cfg: MappingConfig, path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path), toJson(cfg).getBytes("UTF-8"))
}
