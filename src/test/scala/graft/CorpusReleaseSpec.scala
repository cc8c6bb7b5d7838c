package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.{Dedup, TextAnalysis}
import graft.pipeline.CorpusRelease
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q179 — the corpus-release capstone: per-stage observe() counters pinned
  * equal to independent recomputation of each stage (the q80 discipline),
  * and the read-back manifest's structural invariants. The VALUE-level
  * contract (every shard row, byte, token, chunk span) is the DuckDB
  * oracle's chained-CTE replay; this spec owns what SQL can't see — the
  * observation plumbing and the on-disk layout.
  */
class CorpusReleaseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("q179 corpus release: stage counters match independent recomputation; manifest is contiguous") {
    val (manifestDf, obs) = CorpusRelease.corpusReleaseObserved(spark, TestSpark.Sf0001)
    val manifest = manifestDf
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    assert(manifest.nonEmpty)
    val m = obs.toMap.map { case (k, o) => k -> o.get }

    // --- independent recomputation of every stage boundary -------------
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    assert(m("release_gate")("rows_scanned") == docs.count())
    val pass = TextAnalysis.cascadePreds.map(_._2).reduce(_ && _)
    val gated = TextAnalysis.cascadeBase(spark, TestSpark.Sf0001)
      .filter(pass).select(col("doc_id"), col("lang"), col("text"))
      .localCheckpoint(true)
    assert(m("release_gate")("rows_gated") == gated.count())
    val deduped = gated.join(
        gated.groupBy(TF.contentHash(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    assert(m("release_exact")("rows_exact_kept") == deduped.count())
    val nd = deduped.join(
        Dedup.nearDupClustersFor(deduped, 0.5).filter(col("keep"))
          .select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    assert(m("release_neardup")("rows_neardup_kept") == nd.count())
    val isEval = col("doc_id") % 10 === 0
    val released = nd.filter(!isEval).join(
        Dedup.decontaminationReportFor(nd, isEval, 0.5).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
    val nReleased = released.count()
    assert(m("release_decon")("rows_released") == nReleased)
    // the funnel only narrows
    val funnel = Seq(
      m("release_gate")("rows_scanned"), m("release_gate")("rows_gated"),
      m("release_exact")("rows_exact_kept"),
      m("release_neardup")("rows_neardup_kept"),
      m("release_decon")("rows_released")).map(_.asInstanceOf[Long])
    assert(funnel.sliding(2).forall { case Seq(a, b) => a >= b },
      s"stage funnel must be non-increasing: $funnel")
    // every stage must do real work on the fixture, or the chain isn't
    // exercised (gate drops, near-dup drops, decon eval-split drops)
    assert(funnel(0) > funnel(1), "gate dropped nothing")
    assert(funnel(2) > funnel(3), "near-dup dropped nothing")
    assert(funnel(3) > funnel(4), "decon + eval split dropped nothing")

    // --- epoch counters vs the manifest read back from disk ------------
    assert(m("release_epoch")("epoch_rows") == manifest.map(_._2).sum)
    assert(m("release_epoch")("epoch_bytes") == manifest.map(_._4).sum)
    assert(m("release_epoch")("epoch_tokens") == manifest.map(_._5).sum)
    // epoch docs are a subset of the released corpus (downsampled strata
    // legitimately drop n_copies=0 docs)
    assert(manifest.map(_._3).max <= nReleased)

    // --- manifest structure --------------------------------------------
    // shards are the contiguous range 0..max
    assert(manifest.map(_._1).toSeq == (0L until manifest.length.toLong))
    manifest.sliding(2).foreach {
      case Array(s1, s2) =>
        // the epoch is laid out in (doc_id, copy) order, so doc and chunk
        // spans tile monotonically across shard boundaries
        assert(s2._8 >= s1._9, s"doc span regressed: shard ${s1._1}->${s2._1}")
        assert(s2._6 >= s1._6 && s2._7 >= s1._7,
          s"chunk span regressed: shard ${s1._1}->${s2._1}")
      case _ =>
    }
    // every shard except the last is filled to the 16 KiB target: the
    // first row of shard i+1 starts at byte offset >= (i+1) * 16384, and
    // that offset IS the cumulative bytes through shard i
    manifest.init.zipWithIndex.foreach { case (s, i) =>
      assert(manifest.take(i + 1).map(_._4).sum >= (i + 1) * 16384L,
        s"shard ${s._1} underfilled")
    }
  }
}
