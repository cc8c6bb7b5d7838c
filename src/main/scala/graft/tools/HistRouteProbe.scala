package graft.tools

import graft.GraftSession
import graft.operators.Relational

/** Scratch diagnostics — wall-clock of the two histogram routes behind
  * q207/q212 (exact value-grain window vs the `approx_percentile`
  * 100 TB route) at fixture scales, best-of-2 in one JVM (the
  * BENCH_NOTES sf1 protocol). Drives the round-14 BENCH_NOTES rows
  * recording the approx route's sf1 ratios.
  *
  * Usage: runMain graft.tools.HistRouteProbe <sfDir> [<sfDir2> ...]
  */
object HistRouteProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = GraftSession.local("hist-route-probe", "32")
    for (dir <- dirs; exact <- Seq(true, false)) {
      def best(label: String, f: () => Long): Unit = {
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = f()
          (System.nanoTime() - t0) / 1e9 -> n
        }
        println(f"[probe] $label route=${if (exact) "exact" else "approx"} " +
          f"@ $dir: best-of-2 ${times.map(_._1).min}%.2f s " +
          f"(runs ${times.map(t => f"${t._1}%.2f").mkString("/")}, " +
          f"rows ${times.head._2})")
      }
      best("q207", () =>
        Relational.selectivityEstimationAudit(spark, dir,
          exactHistogram = exact).count())
      best("q212", () =>
        Relational.staleStatsAudit(spark, dir,
          exactHistogram = exact).count())
    }
    spark.stop()
  }
}
