package graft

import org.scalatest.funsuite.AnyFunSuite

/** No query may leak a session-lifetime cache entry: every multi-branch
  * leaf in the dedup/sampling family is an EAGER localCheckpoint —
  * computed once for its plan's branches, blocks reclaimed by the
  * ContextCleaner when the plan is garbage-collected — rather than a
  * `.cache()`, which registers in the session cacheManager and survives
  * the query until someone remembers to unpersist (in a long-lived
  * curation session the former round-6 `.cache()` leaves accumulated until
  * LRU eviction). The queries listed are every entry whose leaf was ever
  * cached; the noop sink forces full materialization first, so the
  * emptiness check observes the post-query steady state.
  */
class CacheSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val formerlyLeaky = Seq(
    "q17_ngram_jaccard", "q18_minhash_lsh", "q35_randomsplit_invariant",
    "q49_skewed_split_invariant", "q52_neardup_clusters",
    "q59_decontamination", "q63_winnowing_pairs", "q64_incremental_dedup",
    "q65_neardup_clusters_winnowed", "q66_incremental_dedup_bucketed")

  test("no cached relation outlives its query") {
    spark.catalog.clearCache() // isolate from whatever another suite cached
    for (name <- formerlyLeaky) {
      SparkEntry.queries(name)(spark, TestSpark.Sf0001)
        .write.format("noop").mode("overwrite").save()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left cached relations registered in the session")
    }
  }
}
