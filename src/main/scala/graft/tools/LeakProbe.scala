package graft.tools

/** Long-session degradation probe: invoke one registry query repeatedly
  * in a single JVM and watch wall-clock + leaked storage blocks. The
  * bench's late-pass collapse (q183 12.6 s → 70.7 s between pass 1 and
  * pass 2 of the same run) points at cross-query state accumulating in
  * executor storage (localCheckpoint blocks are never unpersisted).
  * Usage: runMain graft.tools.LeakProbe [query] [sfDir] [n] */
object LeakProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q183_streaming_release")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.drop(2).headOption.map(_.toInt).getOrElse(5)
    val spark = graft.GraftSession.local("graft-leakprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def state(): String = {
      val rdds = spark.sparkContext.getPersistentRDDs.size
      val mem = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum / (1024.0 * 1024.0)
      val heap = (Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory) / (1024.0 * 1024.0)
      f"persistentRDDs=$rdds%5d storageUsedMB=$mem%9.1f heapMB=$heap%9.0f"
    }
    def timedRun(label: String): Unit = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[leakprobe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ${state()}")
    }
    timedRun("warm")
    timedRun("clean-session")
    // simulate the bench: run a broad mix of state-heavy queries once
    val mix = Seq("q66_incremental_dedup_bucketed", "q70_incremental_dedup_xo_replay",
      "q75_incremental_dedup_xo_compacted", "q78_incremental_dedup_winnowed_bucketed",
      "q161_streaming_shard_export", "q182_streaming_erasure",
      "q93_streaming_packing", "q140_streaming_drift", "q133_streaming_reservoir",
      "q228_ann_streaming", "q139_ivf_compaction", "q141_pq_compaction",
      "q94_ivf_incremental", "q118_pq_incremental", "q179_corpus_release",
      "q220_zorder_optimize", "q213_incremental_bloom", "q206_bloom_skipping",
      "q233_matview_maintenance", "q234_matview_rewrite", "q239_matview_compaction",
      "q52_neardup_clusters", "q65_neardup_clusters_winnowed", "q55_curation_neardup",
      "q69_incremental_dedup_multitick", "q64_incremental_dedup",
      "q67_incremental_dedup_winnowed", "q170_streaming_k_anonymity",
      "q155_jsonl_shard_export", "q177_right_to_erasure")
    for (r <- 1 to 2; q <- mix) {
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save(): Unit
    }
    println(s"[leakprobe] after mix                       ${state()}")
    timedRun("post-mix")
    timedRun("post-mix-2")
    // hygiene: drop leaked blocks, nudge the ContextCleaner, retry
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    spark.catalog.clearCache()
    System.gc()
    Thread.sleep(2000)
    println(s"[leakprobe] after cleanup                   ${state()}")
    timedRun("post-cleanup")
    timedRun("post-cleanup-2")
    val _ = n
    spark.stop()
  }
}
