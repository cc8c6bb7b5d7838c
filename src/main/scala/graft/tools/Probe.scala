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
      for ((bits, bandBits) <- Seq((16, 4), (32, 4), (48, 4), (64, 4), (64, 8))) {
        val t0 = System.nanoTime()
        val ann = Similarity.annCosineTopK(spark, dir, nBits = bits, bandBits = bandBits)
          .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$dir bits=$bits band=$bandBits recall=${(exact & ann).size.toDouble / exact.size}%.2f time=$dt%.1f")
      }
    }
    spark.stop()
  }
}
