package graft.tools

import graft.{GraftSession, SparkEntry}

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "32")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/lineitem.parquet").write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q10_distinct_stats")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"q10 run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
