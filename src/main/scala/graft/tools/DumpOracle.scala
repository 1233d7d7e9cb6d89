package graft.tools

import java.nio.file.{Files, Paths}

/** Dumps SparkEntry.oracleSql as JSON without running any Spark query —
  * lets tools/oracle_typecheck.py audit every oracle's DuckDB output
  * types (the driver's hash is type-sensitive; an uncast window-sum
  * HUGEINT reads hash-red even when values match). Not part of the
  * library surface.
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/oracle_sql.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(out), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracle entries to $out")
  }
}
