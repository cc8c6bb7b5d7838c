package graft.tools

import graft.GraftSession
import org.apache.spark.sql.DataFrame

/** Scratch diagnostics main — not part of the engine surface. Currently:
  * regenerates PLANS.md from the live queries at sf0.01. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    val dir = "/root/testdata/sf0.01"
    def q(name: String): DataFrame = graft.SparkEntry.queries(name)(spark, dir)
    val sections: Seq[(String, () => DataFrame)] = Seq(
      "q13_project_scalar" -> (() => q("q13_project_scalar")),
      "q03_join_revenue" -> (() => q("q03_join_revenue")),
      "q17_ngram_jaccard" -> (() => q("q17_ngram_jaccard")),
      "q18_minhash_lsh" -> (() => q("q18_minhash_lsh")),
      "q20_embed_neardup" -> (() => q("q20_embed_neardup")),
      "q21_cosine_topk" -> (() => q("q21_cosine_topk")),
      "q46_bucketed_join" -> (() => q("q46_bucketed_join")),
      "q59_decontamination" -> (() => q("q59_decontamination")),
      "q61_embed_neardup_blocked" -> (() => q("q61_embed_neardup_blocked")),
      "q62_embed_decontamination" -> (() => q("q62_embed_decontamination")),
      "q63_winnowing_pairs" -> (() => q("q63_winnowing_pairs")),
      "q64_incremental_dedup" -> (() => q("q64_incremental_dedup")),
      "q66_incremental_dedup_bucketed" -> (() => q("q66_incremental_dedup_bucketed")),
      "q67_incremental_dedup_winnowed" -> (() => q("q67_incremental_dedup_winnowed")),
      "q68_analytic_windows" -> (() => q("q68_analytic_windows")),
      "q74_asof_join" -> (() => q("q74_asof_join")),
      "q76_cube_orders" -> (() => q("q76_cube_orders")),
      "q79_sql_cosine_topk" -> (() => q("q79_sql_cosine_topk")),
      "q83_heavy_hitter_tokens" -> (() => q("q83_heavy_hitter_tokens")),
      "q86_global_shuffle" -> (() => q("q86_global_shuffle")),
      "q95_unigram_lm_score" -> (() => q("q95_unigram_lm_score")),
      "q96_bm25_topk" -> (() => q("q96_bm25_topk")),
      "q97_stratum_cap" -> (() => q("q97_stratum_cap")),
      "q99_corpus_diversity" -> (() => q("q99_corpus_diversity")),
      "q100_snapshot_diff" -> (() => q("q100_snapshot_diff")),
      "q103_filter_cascade" -> (() => q("q103_filter_cascade")),
      "q104_mixture_resample" -> (() => q("q104_mixture_resample")),
      "q106_bpe_merges" -> (() => q("q106_bpe_merges")),
      "q107_doc_chunking" -> (() => q("q107_doc_chunking")),
      "q109_token_budget" -> (() => q("q109_token_budget")),
      "q110_bigram_lm_score" -> (() => q("q110_bigram_lm_score")),
      "q112_ngram_novelty" -> (() => q("q112_ngram_novelty")),
      "q114_boilerplate" -> (() => q("q114_boilerplate")),
      "q116_pq_topk" -> (() => q("q116_pq_topk")),
      "q119_curriculum_order" -> (() => q("q119_curriculum_order")),
      "q121_passage_dedup" -> (() => q("q121_passage_dedup")),
      "q122_pmi_collocations" -> (() => q("q122_pmi_collocations")),
      "q123_dsir_weights" -> (() => q("q123_dsir_weights")),
      "q124_semantic_dedup" -> (() => q("q124_semantic_dedup")),
      "q125_weighted_sample" -> (() => q("q125_weighted_sample")),
      "q126_containment_pairs" -> (() => q("q126_containment_pairs")),
      "q127_ann_router" -> (() => q("q127_ann_router")),
      "q128_hybrid_rrf" -> (() => q("q128_hybrid_rrf")),
      "q130_hard_negatives" -> (() => q("q130_hard_negatives")),
      "q131_sq8_audit" -> (() => q("q131_sq8_audit")),
      "q134_cdc_chunks" -> (() => q("q134_cdc_chunks")),
      "q135_token_drift" -> (() => q("q135_token_drift")),
      "q136_cdc_dedup" -> (() => q("q136_cdc_dedup")),
      "q137_matryoshka_audit" -> (() => q("q137_matryoshka_audit")),
      "q138_source_scorecard" -> (() => q("q138_source_scorecard")),
      "q139_ivf_compaction" -> (() => q("q139_ivf_compaction")),
      "q140_streaming_drift" -> (() => q("q140_streaming_drift")),
      "q141_pq_compaction" -> (() => q("q141_pq_compaction")),
      "q142_chunk_incremental_dedup" -> (() => q("q142_chunk_incremental_dedup")),
      "q143_embedding_drift" -> (() => q("q143_embedding_drift")),
      "q144_packing_efficiency" -> (() => q("q144_packing_efficiency")),
      "q145_ann_route" -> (() => q("q145_ann_route")),
      "q146_fed_eval_metric" -> (() => q("q146_fed_eval_metric")),
      "q147_zipf_audit" -> (() => q("q147_zipf_audit")),
      "q148_scorer_agreement" -> (() => q("q148_scorer_agreement")),
      "q149_calibration_ece" -> (() => q("q149_calibration_ece")),
      "q150_substring_runs" -> (() => q("q150_substring_runs")),
      "q151_repeated_span_scrub" -> (() => q("q151_repeated_span_scrub")),
      "q152_knn_label_audit" -> (() => q("q152_knn_label_audit")),
      "q153_tokenizer_fertility" -> (() => q("q153_tokenizer_fertility")),
      "q154_minhash_estimator_audit" -> (() => q("q154_minhash_estimator_audit")),
      "q155_jsonl_shard_export" -> (() => q("q155_jsonl_shard_export")),
      "q156_substring_contamination" -> (() => q("q156_substring_contamination")),
      "q157_knn_mislabel_candidates" -> (() => q("q157_knn_mislabel_candidates")),
      "q158_effective_token_budget" -> (() => q("q158_effective_token_budget")),
      "q159_ranking_agreement" -> (() => q("q159_ranking_agreement")),
      "q160_compression_signal" -> (() => q("q160_compression_signal")),
      "q161_streaming_shard_export" -> (() => q("q161_streaming_shard_export")),
      "q162_pii_scorecard" -> (() => q("q162_pii_scorecard")),
      "q78 candidate core (bucketed fp index: Exchange-free index side)" -> (() => {
        val table = "graft_probe_fpidx"
        val docs = graft.Tables.documents(spark, dir)
        val isNew = org.apache.spark.sql.functions.col("doc_id") % 7 === 0
        graft.operators.IncrementalDedup.writeFpIndexBucketed(
          docs.filter(!isNew), table)
        graft.operators.IncrementalDedup.fpCandidatesBucketed(
          docs.filter(isNew), table)
      }),
      "q65 pair core (winnowed candidates + exact Jaccard re-score)" -> (() =>
        graft.operators.Dedup.winnowCandidateJaccardPairsFor(
          graft.Tables.documents(spark, dir))),
      "ivf_assign (literal codebook: in-row argmax, zero Exchange)" -> (() =>
        graft.operators.Similarity.ivfAssign(
          graft.Tables.embeddings(spark, dir)
            .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding")),
          graft.operators.Similarity.trainCentroids(
            graft.Tables.embeddings(spark, dir)
              .select(org.apache.spark.sql.functions.col("vec_id"),
                org.apache.spark.sql.functions.col("embedding")), 16, 0))),
      "ivf_assign_broadcast (large codebook: codebook as broadcast data)" -> (() =>
        graft.operators.Similarity.ivfAssignBroadcast(
          graft.Tables.embeddings(spark, dir)
            .select(org.apache.spark.sql.functions.col("vec_id"),
              org.apache.spark.sql.functions.col("embedding")),
          graft.operators.Similarity.centroidsToDF(spark,
            graft.operators.Similarity.trainCentroids(
              graft.Tables.embeddings(spark, dir)
                .select(org.apache.spark.sql.functions.col("vec_id"),
                  org.apache.spark.sql.functions.col("embedding")), 16, 0))))
    )
    val sb = new StringBuilder
    sb.append(
      """# PLANS — formatted physical plans of the headline queries (sf0.01)
        |
        |Generated by `graft.tools.Probe`; regenerate after plan-affecting changes.
        |What to look for: `PushedFilters` + pruned `ReadSchema` on scans,
        |`BroadcastHashJoin` on dimension sides, `cosine_f32` (native expression)
        |in similarity projections, `Bucketed: true` scans joining without a
        |shuffle, and codegen stage markers (`*(n)`).
        |
        |Since round 7 the multi-branch shingle/fingerprint leaves are EAGER
        |localCheckpoints (no session cache leak — see CacheSpec), so dedup-family
        |plans read `Scan ExistingRDD` where earlier rounds showed the parquet
        |scan + shingle flatMap: the leaf is computed once at query construction
        |and every branch reads the checkpointed blocks. Shard-bounded leaves
        |keep that form; since round 11 EVERY corpus-shaped leaf (the
        |q17/q18/q59/q63/q65 shingle/fingerprint leaves, q126's shingles,
        |q136's chunks, the bucketed index bootstraps) spills to scratch
        |parquet instead — their consumers show a plain parquet scan of the
        |spill (recoverable lineage, no executor-storage pin).
        |""".stripMargin)
    for ((name, build) <- sections) {
      println(s"===== $name =====")
      val plan = build().queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n$plan\n```\n")
    }
    val w = new java.io.PrintWriter("/root/repo/PLANS.md")
    try w.write(sb.toString) finally w.close()
    println("wrote PLANS.md")
    spark.stop()
  }
}
