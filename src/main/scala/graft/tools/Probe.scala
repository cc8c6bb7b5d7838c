package graft.tools

import graft.GraftSession

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "4")
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    spark.sql(
      """SELECT vec_id, round(cosine_f32(embedding, embedding), 6) AS self_cos,
        |       hyperplane_sig(embedding, 16) AS sig
        |FROM emb ORDER BY vec_id LIMIT 3""".stripMargin).show()
    spark.stop()
  }
}
