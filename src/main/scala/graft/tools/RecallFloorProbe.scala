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
  * Usage: runMain graft.tools.RecallFloorProbe <sfDir> [nameSubstr ...]
  * (optional name filters select a subset of the lifecycle/rebuild
  * entries — each of those re-runs its full store build per floor, so
  * an unfiltered sweep is expensive by design)
  */
object RecallFloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val nameFilter = args.drop(1).toSeq
    def keep(name: String): Boolean =
      nameFilter.isEmpty || nameFilter.exists(name.contains)
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

    if (keep("ivf-fresh")) report("ivf-fresh", Similarity.ivfCosineTopK(spark, dir))
    if (keep("pq-fresh")) report("pq-fresh", Similarity.pqCosineTopK(spark, dir))
    if (keep("lsh-fresh")) report("lsh-fresh", Similarity.annCosineTopK(spark, dir))
    // lifecycle audits emit (query_id, n_exact, recall_ok); probe their
    // raw overlap by re-deriving the routed side at floor 0 (recall_ok
    // TRUE everywhere) and reading hits out of the audit's own columns
    // is not possible — so re-run the lifecycle with floor 0 and report
    // violations at candidate floors instead
    for ((name, fn) <- Seq[(String, Double => org.apache.spark.sql.DataFrame)](
           ("ivf-lc-p4", f => Similarity.ivfLifecycleRecallAudit(spark, dir, floor = f)),
           ("ivf-lc-p8", f => Similarity.ivfLifecycleRecallAudit(spark, dir, nProbe = 8, floor = f)),
           ("pq-lc-r100", f => Similarity.pqLifecycleRecallAudit(spark, dir, rerank = 100, floor = f)),
           ("pq-lc-r200", f => Similarity.pqLifecycleRecallAudit(spark, dir, floor = f)),
           // the scale lever: rerank as a CONSTANT FRACTION of the corpus
           // (1%, = the default 200 at the sf0.1 fixture) — the knob a
           // frozen compressed store turns as the corpus outgrows its books
           ("pq-lc-r1pct", f => Similarity.pqLifecycleRecallAudit(spark, dir,
             rerank = (graft.Tables.embeddings(spark, dir).count() / 100).toInt.max(100),
             floor = f)),
           // the capacity lever: finer sub-quantizers (m 8 -> 16, subDim
           // 8 -> 4) — the knob that matters when the corpus geometry
           // outgrows the code book rather than the rerank window
           ("pq-lc-m16", f => Similarity.pqLifecycleRecallAudit(spark, dir,
             m = 16, floor = f)),
           // the rebuild verb: full-member retrain at doubled capacity,
           // probed through the rebuilt persisted store (q203/q204)
           ("ivf-rebuild-p8", f => Similarity.ivfRebuildRecallAudit(spark, dir, nProbe = 8, floor = f)),
           ("ivf-rebuild-p16", f => Similarity.ivfRebuildRecallAudit(spark, dir, nProbe = 16, floor = f)),
           ("pq-rebuild", f => Similarity.pqRebuildRecallAudit(spark, dir, floor = f)))
           if keep(name);
         floor <- Seq(0.2, 0.4, 0.6, 0.8, 1.0)) {
      val rows = fn(floor).collect()
      val bad = rows.count(r => !r.getBoolean(2))
      println(f"[probe] $name @ $dir floor=$floor%.1f: violations=$bad/${rows.length}")
    }
    spark.stop()
  }
}
