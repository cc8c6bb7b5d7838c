package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** q161 — STREAMING JSONL SHARD EXPORT: the micro-batch twin of q155. A
  * corpus release is usually cut while ingest is still running, so shard
  * ids must keep counting monotonically across micro-batches: each batch
  * assigns its docs with the q155 two-level prefix sum OFFSET by the
  * running byte total of every prior batch (`bytesBefore` — the single
  * scalar of cross-batch state, the q93 `tokensBefore` discipline). A
  * shard that spans a batch boundary simply continues under the next
  * batch's partition; the manifest groups by shard across batches, so
  * the STREAMED layout reproduces the batch export exactly whenever
  * batches arrive in doc_id-contiguous order — which is why q161's
  * oracle is q155's SQL VERBATIM (the q133 stream≡batch discipline: one
  * oracle pins stream-equals-batch AND replay idempotence).
  *
  * Exactly-once follows the q93 layout: shard payloads land under
  * (ingest_batch, shard) partitions and each tick OVERWRITES its own
  * ingest_batch partitions (dynamic partition overwrite); the byte base
  * reads totals partitions with `ingest_batch < batchId` ONLY, so a
  * crashed-and-replayed tick recomputes from exactly the pre-batch state.
  */
object ShardExportStream {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deleteDir(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true): Unit

  /** Running byte total of every batch BEFORE `batchId`. */
  private[graft] def bytesBefore(spark: SparkSession, totalsPath: String,
                                 batchId: Long): Long =
    if (!fs(spark, totalsPath).exists(new org.apache.hadoop.fs.Path(totalsPath))) 0L
    else spark.read.parquet(totalsPath)
      .filter(col("ingest_batch") < batchId)
      .agg(coalesce(sum(col("batch_bytes")), lit(0L))).head().getLong(0)

  /** One exactly-once export tick: assign this batch's docs from the
    * pre-batch byte base, land the JSONL payloads under
    * (ingest_batch, shard) and the byte total under the batch's own
    * totals partition. Safe to re-run with the same batchId. */
  def exportTickXO(batch: DataFrame, batchId: Long, shardsPath: String,
                   totalsPath: String, targetBytes: Long = 16384L,
                   blockSize: Long = 64L): Unit = {
    val spark = batch.sparkSession
    val base = bytesBefore(spark, totalsPath, batchId)
    graft.sources.Sources.shardAssign(
        batch.select(col("doc_id"), col("lang"), col("text")),
        targetBytes, blockSize, base)
      .withColumn("ingest_batch", lit(batchId))
      .repartition(col("shard"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "shard").json(shardsPath)
    batch.agg(coalesce(sum(length(col("text")).cast("long")), lit(0L))
        .as("batch_bytes"))
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(totalsPath)
  }

  /** The release manifest over everything exported so far, computed from
    * the files READ BACK (the q155 proof-of-round-trip contract). */
  def currentManifest(spark: SparkSession, shardsPath: String): DataFrame =
    graft.sources.Sources.shardManifest(spark, shardsPath)

  /** The foreachBatch wrapper: Spark's own batchId keys the idempotent
    * tick, so checkpoint-recovery replays rewrite their own partitions. */
  def streamingShardExport(docsStream: DataFrame, shardsPath: String,
                           totalsPath: String, targetBytes: Long = 16384L,
                           blockSize: Long = 64L): DataStreamWriter[Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      exportTickXO(batch, batchId, shardsPath, totalsPath,
        targetBytes, blockSize)
    }

  /** The registry fixture form: the documents table as three
    * doc_id-contiguous ticks (thresholds at thirds of the max id — any
    * doc_id-ordered cut reproduces the batch assignment), then the
    * cross-batch manifest. Oracle = q155's SQL verbatim. */
  def shardExportTicks(spark: SparkSession, dir: String,
                       targetBytes: Long = 16384L): DataFrame = {
    // persisted once for the run: the max-id probe plus three ticks × two
    // consumers each otherwise re-scan the raw table seven times (ticks
    // are inherently sequential — each tick's byte base reads the prior
    // tick's totals — so the corpus read is the one shareable cost, the
    // q183 discipline)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).persist()
    try {
      val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
      val (t1, t2) = (maxId / 3, 2L * maxId / 3)
      val shardsPath = graft.sources.Sources.scratchDir(spark, "stream_export_shards")
      val totalsPath = graft.sources.Sources.scratchDir(spark, "stream_export_totals")
      deleteDir(spark, shardsPath); deleteDir(spark, totalsPath)
      exportTickXO(docs.filter(col("doc_id") <= t1), 0L, shardsPath, totalsPath, targetBytes)
      exportTickXO(docs.filter(col("doc_id") > t1 && col("doc_id") <= t2),
        1L, shardsPath, totalsPath, targetBytes)
      exportTickXO(docs.filter(col("doc_id") > t2), 2L, shardsPath, totalsPath, targetBytes)
      currentManifest(spark, shardsPath)
    } finally { docs.unpersist(); () }
  }
}
