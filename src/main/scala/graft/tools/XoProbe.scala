package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level wall-clock attribution for the q70/q75 exactly-once
  * incremental-dedup family (the BENCH_NOTES probe discipline — the
  * r18 verdict's task 5: the family is the #4/#6 driver bench row and
  * never had a fresh-JVM attribution of its own). Replays each
  * fixture's phases one at a time so the trim work lands on the phase
  * that actually costs, not a guess. Usage:
  * runMain graft.tools.XoProbe [sfDir] */
object XoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("graft-xoprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.operators.IncrementalDedup._
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[xoprobe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir).persist()
    timed("warm corpus")(docs.count())
    val mod = col("doc_id") % 7
    val isNew = mod === 0

    // two rounds: round 1 pays the JIT/codegen warmup the in-suite
    // bench has long amortized; round 2 is the steady-state
    // attribution the BENCH_NOTES row cites
    for (round <- 1 to 2) {
      def lbl(s: String): String = s"r$round $s"
      // --- q70 phases ---
      locally {
        val table = s"graft_xoprobe70_$round"
        val adm = graft.sources.Sources.scratchDirUnique(spark, "xoprobe70")
        timed(lbl("q70 bootstrap index (bucketed)")) {
          writeShingleIndexBucketedXO(docs.filter(!isNew), table)
        }
        timed(lbl("q70 tick 0 (attempt)")) {
          ingestShardBucketedXO(docs.filter(isNew), 0L, table, adm)
        }
        timed(lbl("q70 tick 0 (replay)")) {
          ingestShardBucketedXO(docs.filter(isNew), 0L, table, adm)
        }
        timed(lbl("q70 sink read")) {
          spark.read.parquet(adm).select(col("doc_id")).count()
        }
        // sub-phase split of one tick: the cross-index report alone,
        // the shard shingle materialization alone — the remainder of a
        // tick is the three write legs (2 bucketed appends + 1 dynamic
        // overwrite) plus catalog compensation
        timed(lbl("q70 sub: report only")) {
          reportForBucketed(docs.filter(isNew), table).count()
        }
        timed(lbl("q70 sub: shard shingles checkpoint")) {
          graft.operators.Dedup.docShingles(docs.filter(isNew))
            .localCheckpoint(true).unpersist(true)
        }
      }
      // --- q75 phases ---
      locally {
        val table = s"graft_xoprobe75_$round"
        val adm = graft.sources.Sources.scratchDirUnique(spark, "xoprobe75")
        timed(lbl("q75 bootstrap index (bucketed)")) {
          writeShingleIndexBucketedXO(docs.filter(mod >= 2), table)
        }
        timed(lbl("q75 tick 0")) {
          ingestShardBucketedXO(docs.filter(mod === 0), 0L, table, adm)
        }
        timed(lbl("q75 compaction (fold tick 0)")) {
          compactShingleIndexBucketedXO(spark, table, settledThrough = 0L)
        }
        timed(lbl("q75 tick 0 replay (watermark no-op)")) {
          ingestShardBucketedXO(docs.filter(mod === 0), 0L, table, adm)
        }
        timed(lbl("q75 tick 1")) {
          ingestShardBucketedXO(docs.filter(mod === 1), 1L, table, adm)
        }
        timed(lbl("q75 sink read")) {
          spark.read.parquet(adm).select(col("doc_id")).count()
        }
      }
    }
    spark.stop()
  }
}
