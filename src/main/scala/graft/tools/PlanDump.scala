package graft.tools

import graft.GraftSession

/** Scratch diagnostics main — not part of the engine surface. Writes the
  * `.explain("formatted")` output of named registry queries to one file
  * each, for the optimization-round before/after plan artifacts:
  *
  *   sbt "runMain graft.tools.PlanDump /root/repo/plans/r21 _after /root/testdata/sf0.01 q52_neardup_clusters ..."
  *
  * Args: outDir suffix sfDir name... — each query lands at
  * `outDir/<name><suffix>.txt`. Lifecycle queries run their builds during
  * construction (same as Probe), so the dump reflects the executed
  * fixture state.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (outDir, suffix, dir, names) = (args(0), args(1), args(2), args.drop(3))
    val spark = GraftSession.local("plandump",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    new java.io.File(outDir).mkdirs()
    for (n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(spark, dir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/$n$suffix.txt", "UTF-8")
        try w.write(plan) finally w.close()
        println(s"[plandump] wrote $n$suffix")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $n failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
