package graft.tools

/** Rewrite `outDir/oracle_sql.json` from the current SparkEntry.oracleSql
  * WITHOUT re-running any query — the fast path when only oracle SQL
  * strings changed and the parquet dumps are still valid.
  * Usage: runMain graft.tools.OracleDump [outDir]
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/verify_out"
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
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"[oracle-dump] wrote $outDir/oracle_sql.json (${graft.SparkEntry.oracleSql.size} oracles)")
  }
}
