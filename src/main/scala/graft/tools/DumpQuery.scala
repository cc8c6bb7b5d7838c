package graft.tools

import graft.GraftSession

/** Scratch single-query dump — not part of the engine surface. Writes one
  * `SparkEntry.queries` result to parquet for a local DuckDB spot-check
  * without paying the full Verify sweep:
  *
  *   sbt "runMain graft.tools.DumpQuery q74_asof_join /root/testdata/sf0.01 /tmp/q74"
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = GraftSession.local("dump-" + name, "8")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outDir)
    println(s"wrote $outDir")
    spark.stop()
  }
}
