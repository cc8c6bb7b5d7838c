package graft.streaming

import graft.Tables
import graft.operators.Sampling
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** q133 — STREAMING DETERMINISTIC RESERVOIR (per-stratum bottom-k): keep a
  * fixed-size uniform sample per stratum over an unbounded ingest stream —
  * the "hold out k docs per language for eval/inspection" verb a pipeline
  * runs while the corpus is still arriving. Classic reservoir sampling is
  * sequential (one RNG draw per arrival, order-dependent); this is the
  * distributed, deterministic form: the sample is the k SMALLEST seeded
  * hashes md5(doc_id:seed) per stratum — a bottom-k sketch. Bottom-k is a
  * SEMILATTICE fold (min-k of a union = min-k of the per-part min-ks), so
  * each micro-batch contributes only its own bottom-k candidates and the
  * current sample is the bottom-k of the accumulated candidates — state
  * bounded at k · strata per batch partition, merge associative and
  * commutative, arrival order irrelevant.
  *
  * The payoff over an RNG reservoir: the streamed sample provably equals
  * the BATCH bottom-k over everything that has arrived (q97's seeded-hash
  * order), so one oracle pins stream ≡ batch — and a re-run from scratch,
  * a different sharding, or a crashed-and-replayed tick all converge to
  * the same rows (the q34/D11 determinism discipline).
  *
  * Replay safety is the q93 layout discipline: each tick OVERWRITES its
  * own ingest_batch partition (dynamic partition overwrite), so a
  * checkpoint-recovery replay rewrites identical files instead of
  * appending beside them; the merge fold then never sees duplicates.
  *
  * Scale shape: the per-batch rank is the D11 two-level form (widest task
  * = a (stratum, hash-prefix) cell); the merge fold re-ranks only the
  * candidate relation (k · batches · strata rows — index-sized, never
  * corpus-sized); the corpus itself is scanned once per tick and never
  * retained. Reference: bottom-k sketches (Cohen & Kaplan, PODS 2007).
  */
object ReservoirSampleStream {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deleteDir(spark: SparkSession, path: String): Unit = {
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true)
    // a fresh bootstrap also resets the store's generation pointer (a
    // prior same-session compaction may have flipped it elsewhere)
    graft.sources.Sources.resetLivePointer(spark, path)
  }

  /** This batch's per-stratum bottom-k candidates under the seeded-hash
    * order — the only rows the batch contributes to the reservoir. */
  def batchBottomK(batch: DataFrame, k: Int, seed: Long = 42L,
                   prefixChars: Int = 2): DataFrame =
    Sampling.hashRankWithin(batch.select(col("doc_id"), col("lang")),
        "lang", "doc_id", seed, prefixChars)
      .filter(col("pos") <= k)
      .select(col("doc_id"), col("lang"))

  /** One exactly-once reservoir tick: land this batch's candidates under
    * the batch's own partition. Safe to re-run with the same batchId. */
  def sampleTickXO(batch: DataFrame, batchId: Long, path: String,
                   k: Int = 50, seed: Long = 42L,
                   prefixChars: Int = 2): Unit = {
    val spark = batch.sparkSession
    // the store's parameters are DATA, not caller discipline: ticks at a
    // different (k, seed, prefix) than the store was opened with would
    // silently mix incompatible candidate sets
    val live = graft.sources.Sources.livePath(spark, path)
    graft.sources.Sources.requireIndexMeta(spark, live, reservoirMeta(k, seed, prefixChars))
    batchBottomK(batch, k, seed, prefixChars)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(live)
    graft.sources.Sources.writeIndexMeta(spark, live, reservoirMeta(k, seed, prefixChars))
  }

  private def reservoirMeta(k: Int, seed: Long, prefixChars: Int) =
    Map("k" -> k.toString, "seed" -> seed.toString,
      "prefix_chars" -> prefixChars.toString)

  /** The store's recorded write-time k (`Int.MaxValue` when the store
    * predates the sidecar — then the scaladoc contract is all there is). */
  private def storedK(spark: SparkSession, path: String): Int =
    graft.sources.Sources.readIndexMeta(spark,
        graft.sources.Sources.livePath(spark, path))
      .get("k").map(_.toInt).getOrElse(Int.MaxValue)

  /** The current reservoir: bottom-k of the accumulated candidates — the
    * semilattice merge, ranked over an index-sized relation only.
    * Returns (doc_id, lang, pos), q97's exact output contract.
    *
    * CONTRACT (now enforced by the store's parameter sidecar, not just
    * this scaladoc): `k` here must be ≤ the `k` the ticks were written
    * with — bottom-k' of a bottom-k store is exact for k' ≤ k, but a
    * LARGER k' would silently return an underfilled reservoir (candidates
    * beyond each batch's bottom-k were never landed). The store records
    * its write-time k; a larger probe fails loudly. */
  def currentSample(spark: SparkSession, path: String, k: Int = 50,
                    seed: Long = 42L, prefixChars: Int = 2): DataFrame = {
    graft.sources.Sources.requireIndexMeta(spark,
      graft.sources.Sources.livePath(spark, path),
      Map("seed" -> seed.toString, "prefix_chars" -> prefixChars.toString))
    require(k <= storedK(spark, path),
      s"reservoir at $path holds bottom-${storedK(spark, path)} candidates; " +
        s"a k=$k merge would silently return an underfilled sample")
    Sampling.hashRankWithin(
        spark.read.parquet(graft.sources.Sources.livePath(spark, path))
          .select(col("doc_id"), col("lang")).distinct(),
        "lang", "doc_id", seed, prefixChars)
      .filter(col("pos") <= k)
      .select(col("doc_id"), col("lang"), col("pos"))
  }

  /** Reservoir compaction — the D9/q139 maintenance verb for this store:
    * after K ticks the candidate table is K partitions whose union the
    * merge re-reads every call; folding them into the settled
    * ingest_batch = −1 partition as the CURRENT bottom-k keeps the store
    * at exactly k·strata rows forever. Sound because bottom-k is the
    * semilattice fold: bottom-k(settled ∪ future) = bottom-k(bottom-k
    * (settled) ∪ future) — compaction loses nothing a future merge
    * needs. Blue/green versioned swap (r15): the folded store lands at
    * the next generation WITH its parameter sidecar, then the pointer
    * flip publishes both atomically — the old stagedSwap's
    * delete-to-rename crash window no longer exists. `k` must be ≥ any
    * k later merges will ask for (the merge contract above, applied to
    * the store itself) — the sidecar records the store's EFFECTIVE k
    * after compaction, min(write-time k, this k), so a later over-k
    * merge still fails loudly. */
  def compactReservoir(spark: SparkSession, path: String, k: Int = 50,
                       seed: Long = 42L, prefixChars: Int = 2): Unit = {
    graft.sources.Sources.requireIndexMeta(spark,
      graft.sources.Sources.livePath(spark, path),
      Map("seed" -> seed.toString, "prefix_chars" -> prefixChars.toString))
    val effectiveK = math.min(k.toLong, storedK(spark, path).toLong).toInt
    graft.sources.Sources.versionedSwap(spark, path) { (live, staged) =>
      Sampling.hashRankWithin(
          spark.read.parquet(live).select(col("doc_id"), col("lang")).distinct(),
          "lang", "doc_id", seed, prefixChars)
        .filter(col("pos") <= k)
        .select(col("doc_id"), col("lang"))
        .withColumn("ingest_batch", lit(-1L))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .parquet(staged)
      // the sidecar rides the generation: published by the same flip
      graft.sources.Sources.writeIndexMeta(spark, staged,
        reservoirMeta(effectiveK, seed, prefixChars))
    }
  }

  /** The foreachBatch wrapper: Spark's own batchId keys the idempotent
    * tick, so checkpoint-recovery replays rewrite their own partitions. */
  def streamingReservoir(docsStream: DataFrame, path: String, k: Int = 50,
                         seed: Long = 42L): DataStreamWriter[Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sampleTickXO(batch, batchId, path, k, seed)
    }

  /** The driver-runnable multi-tick form (q93's bootstrap shape): stream
    * the documents table in three disjoint shards — with tick 1 replayed
    * to exercise the overwrite discipline — then return the merged
    * reservoir. Its oracle is q97's batch SQL verbatim: the one oracle
    * proves stream ≡ batch AND replay idempotence at once. */
  def reservoirMultiTick(spark: SparkSession, dir: String, k: Int = 50,
                         seed: Long = 42L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val hex = graft.sources.Sources.dirTag(dir)
    val path = graft.sources.Sources.scratchDir(spark, "reservoir_" + hex)
    deleteDir(spark, path)
    val maxId = docs.agg(coalesce(max(col("doc_id")), lit(0L)))
      .head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3)
    val ticks = Seq(
      docs.filter(col("doc_id") <= cuts.head),
      docs.filter(col("doc_id") > cuts.head && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1)))
    sampleTickXO(ticks(0), 0L, path, k, seed)
    sampleTickXO(ticks(1), 1L, path, k, seed)
    sampleTickXO(ticks(1), 1L, path, k, seed) // replay: must be a no-op
    sampleTickXO(ticks(2), 2L, path, k, seed)
    currentSample(spark, path, k, seed)
  }
}
