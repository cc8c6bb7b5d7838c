package graft.streaming

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** q140 — STREAMING DRIFT MONITOR: q135's distribution-drift report kept
  * live over an ingest stream — per micro-batch, the Jensen–Shannon
  * divergence between THAT BATCH's token marginal and a FROZEN reference
  * marginal (the settled corpus the current model was trained on), one
  * row per tick. This is the data-quality alarm a production ingest
  * carries: a tick whose JS jumps is a shard from the wrong source, a
  * scraper gone wrong, or an encoding regression — caught at arrival,
  * not at the next full-corpus audit (q135's batch form).
  *
  * The reference marginal is a TABLE the tick joins (token-keyed,
  * vocab-sized) — never a driver collect, so a 100 TB reference vocab
  * changes nothing. Per tick: one explode + map-side-combined hash agg
  * over the batch (vocab_batch rows), a full-outer join against the
  * reference relation (union semantics, 0·ln 0 via coalesce — exactly
  * q135's arithmetic), one 1-row aggregate. Exactly-once is the q93
  * layout discipline: each tick OVERWRITES its own ingest_batch
  * partition, so a checkpoint-recovery replay rewrites the same row.
  *
  * Deterministic double math end to end — the multi-tick fixture form is
  * fully DuckDB-oracled (the oracle recomputes every tick's JS from the
  * same modulo shards and the same reference split).
  */
object DriftMonitorStream {

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deleteDir(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true): Unit

  /** (token, c) counts of a (doc_id, text) relation — the marginal's
    * integer form (probabilities divide at join time so the reference
    * can be persisted without committing to a denominator type). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(explode(TF.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  /** One exactly-once drift tick: JS(batch ‖ reference) as a single row
    * (n_tokens, js_divergence) landed under the tick's own partition. */
  def driftTickXO(batch: DataFrame, batchId: Long, path: String,
                  refCounts: DataFrame): Unit = {
    val bc = tokenCounts(batch)
    // The batch total is a ONE-ROW aggregate — computed driver-side (the
    // bounded-collect discipline) both to guard the empty case and to
    // feed the divisions as a literal instead of a crossJoin. An empty
    // micro-batch (a trigger with no arrivals — a real foreachBatch
    // possibility) or an all-empty-text one would otherwise make
    // nb = sum(c) = NULL and poison every division into a (null, null)
    // row; downstream alerting must never see nulls. The empty batch's
    // marginal is maximally far from any reference: land the defined
    // extreme, JS = ln 2, with n_tokens = 0 — a loud alarm row for a
    // silent tick.
    val nb = bc.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val row =
      if (nb == 0L)
        batch.sparkSession.range(1)
          .select(lit(0L).as("n_tokens"), lit(math.log(2.0)).as("js_divergence"))
      else {
        val rTot = refCounts.agg(sum(col("c")).as("nr"))
        bc.withColumnRenamed("c", "cb")
          .join(refCounts.withColumnRenamed("c", "cr"), Seq("token"), "full_outer")
          .crossJoin(broadcast(rTot))
          .select(
            (coalesce(col("cb"), lit(0L)).cast("double") / lit(nb)).as("p1"),
            (coalesce(col("cr"), lit(0L)).cast("double") / col("nr")).as("p2"))
          .withColumn("m", (col("p1") + col("p2")) / 2.0)
          .agg(TF.jsDivergenceAgg(col("p1"), col("p2"), col("m"))
            .as("js_divergence"))
          .select(lit(nb).as("n_tokens"), col("js_divergence"))
      }
    row.withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch").parquet(path)
  }

  /** The foreachBatch wrapper over a frozen reference-counts relation. */
  def streamingDriftMonitor(docsStream: DataFrame, path: String,
                            refCounts: DataFrame): DataStreamWriter[Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      driftTickXO(batch, batchId, path, refCounts)
    }

  /** Driver-runnable multi-tick form (the q93/q133 bootstrap shape):
    * reference = the doc_id % 5 ≠ 0 split's marginal (q135's v1), the
    * stream = the corpus in three disjoint thirds with tick 1 replayed;
    * returns (ingest_batch, n_tokens, js_divergence) — each tick's JS
    * fully recomputable by the DuckDB oracle. */
  def driftMultiTick(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val ref = tokenCounts(docs.filter(col("doc_id") % 5 =!= 0))
    val hex = graft.sources.Sources.dirTag(dir)
    val path = graft.sources.Sources.scratchDir(spark, "drift_" + hex)
    deleteDir(spark, path)
    val maxId = docs.agg(coalesce(max(col("doc_id")), lit(0L)))
      .head().getLong(0)
    val cuts = Seq(maxId / 3, 2 * maxId / 3)
    val ticks = Seq(
      docs.filter(col("doc_id") <= cuts.head),
      docs.filter(col("doc_id") > cuts.head && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1)))
    driftTickXO(ticks(0), 0L, path, ref)
    driftTickXO(ticks(1), 1L, path, ref)
    driftTickXO(ticks(1), 1L, path, ref) // replay: must rewrite, not append
    driftTickXO(ticks(2), 2L, path, ref)
    spark.read.parquet(path)
      .select(col("ingest_batch").cast("long").as("ingest_batch"),
        col("n_tokens"), col("js_divergence"))
  }
}
