package graft.config

import org.apache.spark.sql.DataFrame

/** Header-name heuristics (SURVEY.md §1.3, T2/T7): `guess_mapping`
  * (app.py:38-72) and brand-name extraction from coded column headers
  * (app.py:237-255). Pure driver-side string logic over `df.columns` —
  * the data never moves.
  */
object AutoDetect {

  /** T1 on plain strings — `_norm` (app.py:29-30). */
  def norm(s: String): String = Option(s).getOrElse("").trim.toLowerCase

  /** T2 — `_contains_any` (app.py:33-35). */
  def containsAny(s: String, keys: Seq[String]): Boolean = {
    val n = norm(s)
    keys.exists(n.contains)
  }

  // Keyword lists verbatim from guess_mapping (app.py:45-63)
  private val respKeys = Seq("respondent id", "resp_id", "rid", "id_responden")
  private val demoKeys = Seq("gender", "age", "usia", "region", "province",
    "city", "kota", "occupation", "job", "sec", "income")
  private val tomKeys = Seq("tom", "top of mind", "top_of_mind", "first mention")
  private val unaidedKeys = Seq("unaided", "spont", "open awareness", "ua_")
  private val aidedKeys = Seq("aided", "prompted", "aa_")
  private val everKeys = Seq("ever used", "ever_used", "ever tried",
    "pernah pakai", "pernah gunakan", "ever_buy")
  private val bumoKeys = Seq("bumo", "most often", "main brand", "usually use",
    "brand utama", "brand yang paling sering")
  private val considerKeys = Seq("consider", "consideration", "consider_set", "pertimbangkan")
  private val csatKeys = Seq("satisfaction", "osat", "kepuasan")
  private val npsKeys = Seq("nps", "recommend", "rekomendasi", "would you recommend")

  /** `guess_mapping` (app.py:38-72): scan headers, prefill the mapping. */
  def guessMapping(df: DataFrame): MappingConfig = {
    val cols = df.columns.toSeq
    def first(keys: Seq[String]): Option[String] = cols.find(containsAny(_, keys))
    def all(keys: Seq[String]): Seq[String] = cols.filter(containsAny(_, keys))
    val tom = first(tomKeys)
    MappingConfig(
      respondent_id = first(respKeys),
      demographics = all(demoKeys),
      awareness = AwarenessCfg(
        tom = tom,
        unaided = all(unaidedKeys).filterNot(tom.contains),
        aided = all(aidedKeys).filterNot(tom.contains)),
      usage = UsageCfg(
        ever_used = all(everKeys),
        bumo = all(bumoKeys),
        consider = all(considerKeys)),
      satisfaction = SatisfactionCfg(csat = first(csatKeys)),
      nps = NpsCfg(score = first(npsKeys)))
  }

  // Prefix/suffix patterns verbatim from app.py:237-241
  private val prefixes = Seq(
    "^ua[_-]?", "^aa[_-]?", "^aw[_-]?", "^ever[_-]?", "^everused[_-]?",
    "^consider[_-]?", "^consid[_-]?", "^cs[_-]?", "^used[_-]?", "^brand[_-]?"
  ).map(p => ("(?i)" + p).r)
  private val suffixes = Seq(
    "[_-]?brand$", "[_-]?used$", "[_-]?ever$", "[_-]?consider$",
    "[_-]?aided$", "[_-]?unaided$"
  ).map(p => ("(?i)" + p).r)

  /** T7 — `extract_brand_from_column` (app.py:243-252): strip coded
    * prefixes/suffixes, collapse [_-]+ to space, trim; fall back to the
    * raw name when everything was stripped.
    */
  def extractBrandFromColumn(colname: String): String = {
    var s = colname
    prefixes.foreach(p => s = p.replaceAllIn(s, ""))
    suffixes.foreach(p => s = p.replaceAllIn(s, ""))
    s = s.replaceAll("[_-]+", " ").trim
    if (s.nonEmpty) s else colname
  }

  /** `brands_from_binary_columns` (app.py:254-255): distinct, sorted. */
  def brandsFromBinaryColumns(cols: Seq[String]): Seq[String] =
    cols.map(extractBrandFromColumn).distinct.sorted
}
