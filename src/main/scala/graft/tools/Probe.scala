package graft.tools

import graft.GraftSession
import graft.operators.Similarity

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "16")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = Similarity.cosineTopK(spark, dir)
        .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((lists, probe) <- Seq((16, 4), (16, 6), (16, 8), (32, 8))) {
        val t0 = System.nanoTime()
        val ivf = Similarity.ivfCosineTopK(spark, dir, nLists = lists, nProbe = probe)
          .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$dir lists=$lists probe=$probe recall=${(exact & ivf).size.toDouble / exact.size}%.2f time=$dt%.1f")
      }
    }
    spark.stop()
  }
}
