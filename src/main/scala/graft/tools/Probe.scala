package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "32")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, dir)
    // warmup
    docs.write.format("noop").mode("overwrite").save()
    time("docShingles")(Dedup.docShingles(docs).write.format("noop").mode("overwrite").save())
    val sh = Dedup.docShingles(docs).cache()
    sh.count()
    time("signatures (sh cached)")(
      Dedup.minhashSignaturesFromShingles(sh, 128).write.format("noop").mode("overwrite").save())
    time("full q18 (cold)") {
      spark.catalog.clearCache()
      Dedup.minhashLshPairs(spark, dir).write.format("noop").mode("overwrite").save()
    }
    time("full q17 (cold)") {
      spark.catalog.clearCache()
      Dedup.ngramJaccardPairs(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
