package graft.tools

import graft.GraftSession
import graft.pipeline.Preprocess

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    import spark.implicits._
    val thumbs = Preprocess.thumbnails(
      Preprocess.normalize(spark, Preprocess.manifest(spark, "/root/testdata/sf0.001")), 8, 8)
    val stats = thumbs.map(r => (r.w, r.h, r.px.length)).distinct().collect().toSeq
    println(s"thumbs: count=${thumbs.count()} planes=$stats")
    spark.stop()
  }
}
