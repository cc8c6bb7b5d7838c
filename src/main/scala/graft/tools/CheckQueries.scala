package graft.tools

import java.nio.file.{Files, Paths}

/** Builder-side spot verifier: dump ONLY the named queries (args after the
  * first two) to `outDir/<name>` parquet plus their oracle SQL, so a local
  * DuckDB compare can gate a new query without paying the full Verify
  * sweep. Usage: runMain graft.tools.CheckQueries <sfDir> <outDir> q... */
object CheckQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSeq
    val spark = graft.GraftSession.local("graft-check", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    new java.io.File(outDir).mkdirs()
    val oracles = graft.SparkEntry.oracleSqlFor(sfDir)
    def esc(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$n")
    }
    val json = names.filter(oracles.contains)
      .map(n => s"${esc(n)}: ${esc(oracles(n))}").mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
