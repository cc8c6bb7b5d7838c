package graft.tools

import graft.GraftSession
import graft.operators.Relational

/** Scratch diagnostics — wall-clock of q197's two quartile routes (exact
  * `percentile` vs the `approx_percentile` 100 TB route) at a fixture
  * scale, best-of-2 in one JVM (the BENCH_NOTES sf1 protocol). Drives the
  * round-14 BENCH_NOTES row recording the approx route's sf1 ratio.
  *
  * Usage: runMain graft.tools.RfmRouteProbe <sfDir> [<sfDir2> ...]
  */
object RfmRouteProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = GraftSession.local("rfm-route-probe", "32")
    for (dir <- dirs; exact <- Seq(true, false)) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = Relational.rfmSegments(spark, dir, exactQuartiles = exact).count()
        (System.nanoTime() - t0) / 1e9 -> n
      }
      val best = times.map(_._1).min
      println(f"[probe] rfm route=${if (exact) "exact" else "approx"} @ $dir: " +
        f"best-of-2 $best%.2f s (runs ${times.map(t => f"${t._1}%.2f").mkString("/")}, " +
        f"rows ${times.head._2})")
    }
    spark.stop()
  }
}
