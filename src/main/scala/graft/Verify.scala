package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession carries the configs correctness depends on (parquet
    // nanos-as-long for the events fixture, UTC, AQE) — building a bare
    // session here would drop them at the one entry point the driver runs.
    val spark = GraftSession.local("graft-verify", cpus)
    new java.io.File(outDir).mkdirs()
    // local-iteration subset (unset for the driver's full sweep): run only
    // queries whose name starts with one of the comma-separated prefixes
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // print the CAUSE CHAIN, not just the top wrapper — Spark wraps
        // decode/codegen failures (e.g. EXPRESSION_DECODING_FAILED) around
        // the actual error, and the wrapper alone is undiagnosable
        val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(t => s"${t.getClass.getSimpleName}: ${t.getMessage}")
          .mkString(" <- ")
        System.err.println(s"[verify] $name failed: $chain")
        e.printStackTrace()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // templated on sfDir so path-dependent oracles (q40 read_blob) always
    // reference the same fixture file the Spark queries just read
    val json = SparkEntry.oracleSqlFor(sfDir)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
