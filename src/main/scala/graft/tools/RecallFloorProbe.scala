package graft.tools

import graft.GraftSession
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch diagnostics — per-query overlap of each routed top-k (IVF,
  * PQ-ADC, hyperplane LSH) against the exact cosine top-k, at a fixture
  * scale. Drives the pinned floors of the q198–q200 routed-recall audits
  * (round-13 verdict item 3): the audits demand `recall_ok` TRUE per
  * query, so the floors must come from the fixtures' measured minima
  * with margin, not from the pooled spec numbers.
  *
  * Usage: runMain graft.tools.RecallFloorProbe <sfDir>
  */
object RecallFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("recall-floor-probe", "16")
    val exact = Similarity.cosineTopK(spark, dir).localCheckpoint(true)

    def report(name: String, routed: DataFrame): Unit = {
      val perQ = exact.select(col("query_id"), col("cand_id"))
        .join(routed.select(col("query_id"), col("cand_id")),
          Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      val base = exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
        .join(perQ, Seq("query_id"), "left")
        .select(col("query_id"), col("n_exact"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .orderBy(col("query_id"))
        .collect()
      val ratios = base.map(r => r.getLong(2).toDouble / r.getLong(1))
      println(s"[probe] $name @ $dir: per-query hits = " +
        base.map(r => s"${r.getLong(0)}:${r.getLong(2)}/${r.getLong(1)}").mkString(" ") +
        f" | min=${ratios.min}%.2f pooled=${ratios.sum / ratios.length}%.3f")
    }

    report("ivf", Similarity.ivfCosineTopK(spark, dir))
    report("pq", Similarity.pqCosineTopK(spark, dir))
    report("lsh", Similarity.annCosineTopK(spark, dir))
    spark.stop()
  }
}
