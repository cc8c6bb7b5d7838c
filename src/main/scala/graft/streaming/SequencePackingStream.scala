package graft.streaming

import graft.Tables
import graft.operators.TextAnalysis
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** q93 — STREAMING SEQUENCE PACKING: the micro-batch twin of q84's
  * concat-and-chunk. A training corpus usually arrives as an ingest stream,
  * not one settled table, so chunk ids must keep counting monotonically
  * across micro-batches: each batch packs its docs with the q84 two-level
  * prefix sum, OFFSET by the running token total of every prior batch — the
  * single scalar of cross-batch state.
  *
  * Replay safety follows the q70 exactly-once discipline, expressed in the
  * table layout rather than a manifest:
  *   - both sinks (chunk manifest + per-batch token totals) are PARTITIONED
  *     by ingest_batch, and each batch OVERWRITES its own partition
  *     (dynamic partition overwrite) — a crashed-and-replayed batch rewrites
  *     the same files instead of appending beside them;
  *   - the base offset is read from totals partitions with
  *     `ingest_batch < batchId` ONLY, so a replay recomputes from exactly
  *     the pre-batch state whether or not the prior attempt got as far as
  *     writing its own totals partition.
  * Deterministic recompute + self-partition overwrite = idempotent replay
  * (spec-pinned: a replayed tick leaves the manifest row set unchanged).
  */
object SequencePackingStream {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deleteDir(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true): Unit

  /** Running token total of every batch BEFORE `batchId` — the one scalar
    * of cross-batch state. Excluding the batch's own partition is what
    * makes a replay start from the pre-batch base. */
  private[graft] def tokensBefore(spark: SparkSession, totalsPath: String,
                                  batchId: Long): Long =
    if (!fs(spark, totalsPath).exists(new org.apache.hadoop.fs.Path(totalsPath))) 0L
    else spark.read.parquet(totalsPath)
      .filter(col("ingest_batch") < batchId)
      .agg(coalesce(sum(col("batch_tokens")), lit(0L))).head().getLong(0)

  /** One exactly-once packing tick: pack this batch's (doc_id, text) rows
    * from the pre-batch base offset and land manifest + totals under the
    * batch's own partition. Safe to re-run with the same batchId. */
  def packShardXO(batch: DataFrame, batchId: Long, manifestPath: String,
                  totalsPath: String, contextLen: Long = 256L,
                  blockSize: Long = 64L): DataFrame = {
    val spark = batch.sparkSession
    val base = tokensBefore(spark, totalsPath, batchId)
    val docs = batch
      .select(col("doc_id"), TF.nTokens(col("text")).cast("long").as("n_tokens"))
    val manifest = TextAnalysis.packManifest(docs, contextLen, blockSize, base)
    def overwriteOwnPartition(df: DataFrame, path: String): Unit =
      df.withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("ingest_batch").parquet(path)
    overwriteOwnPartition(manifest, manifestPath)
    overwriteOwnPartition(
      docs.agg(coalesce(sum(col("n_tokens")), lit(0L)).as("batch_tokens")),
      totalsPath)
    manifest
  }

  /** The foreachBatch wrapper: Spark's own batchId keys the idempotent
    * tick, so checkpoint-recovery replays rewrite their own partitions. */
  def streamingSequencePacking(docsStream: DataFrame, manifestPath: String,
                               totalsPath: String, contextLen: Long = 256L,
                               blockSize: Long = 64L): DataStreamWriter[Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      packShardXO(batch, batchId, manifestPath, totalsPath,
        contextLen, blockSize): Unit
    }

  /** q93 fixture entry: the documents corpus split into three doc_id-range
    * ticks (arrival order = doc_id order, so the cross-batch manifest must
    * equal q84's single-pass manifest — the oracle IS q84's SQL), ingested
    * tick by tick, with tick 1 REPLAYED (same batch id) before tick 2: an
    * offset shift, a duplicated partition, or a base that read the replay's
    * own totals would each break the exact row-set compare. */
  def sequencePackingMultiTick(spark: SparkSession, dir: String,
                               contextLen: Long = 256L,
                               blockSize: Long = 64L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val hex = graft.sources.Sources.dirTag(dir)
    val mPath = graft.sources.Sources.scratchDir(spark, "pack_manifest_" + hex)
    val tPath = graft.sources.Sources.scratchDir(spark, "pack_totals_" + hex)
    // a prior invocation in this session (bench best-of-N) left partitions
    // behind; the tick loop must start from an empty stream history
    deleteDir(spark, mPath)
    deleteDir(spark, tPath)
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3)
    val ticks = Seq(
      docs.filter(col("doc_id") <= cuts.head),
      docs.filter(col("doc_id") > cuts.head && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1)))
    packShardXO(ticks(0), 0L, mPath, tPath, contextLen, blockSize)
    packShardXO(ticks(1), 1L, mPath, tPath, contextLen, blockSize)
    packShardXO(ticks(1), 1L, mPath, tPath, contextLen, blockSize) // replay
    packShardXO(ticks(2), 2L, mPath, tPath, contextLen, blockSize)
    spark.read.parquet(mPath)
      .select(col("doc_id"), col("n_tokens"), col("first_chunk"),
        col("last_chunk"), col("n_chunks"))
  }
}
