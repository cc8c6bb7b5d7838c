package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q182 — STREAMING RIGHT-TO-ERASURE: q177's GDPR Art. 17 rewrite kept
  * live while erasure REQUESTS keep arriving — the shape a production
  * privacy pipeline actually has (requests trickle in; nobody re-rewrites
  * 100 TB per request). The live store is hive-partitioned on a user hash
  * bucket, so a request tick:
  *
  *   1. resolves its victims' BUCKETS (a \|victims\|-bounded distinct,
  *      collected — bounded by the bucket count, 16 here);
  *   2. rewrites ONLY those bucket partitions (dynamic partition
  *      overwrite; untouched buckets' files are never opened — the spec
  *      pins their file lists byte-identical), via a scratch spill because
  *      Spark cannot overwrite a path it is reading;
  *   3. appends count-only tombstones under its own tick partition
  *      (the q93/q161/q170 exactly-once layout), replay-safe against the
  *      mutated store: a replayed tick unions its prior tick partition
  *      with the currently-visible victims and keeps the per-user MAX,
  *      so whichever side saw the pre-tick store wins and counts never
  *      drop after a crash between the store rewrite and tick end.
  *
  * The registered audit reads tombstones AND the store back from disk:
  * per erased subject, total tombstoned rows across ticks and the rows
  * still present, `purged` demanded true — cumulative over ticks it
  * equals the batch erasure of the union of all requests, so the oracle
  * is q177's SQL with the union request set (the q133 one-oracle
  * stream ≡ batch discipline). Null user_ids take the q177 null-safe
  * route: never matched by any request, always retained.
  *
  * Scale: per tick the rewrite cost is \|affected buckets\| × bucket
  * size, not corpus size — with B buckets and a victim set touching b of
  * them, the tick reads/writes b/B of the store; tombstones are
  * victim-sized appends. The audit is one semi-join against the
  * (broadcastable) tombstone key set.
  */
object ErasureStream {

  val NBuckets: Int = 16

  private def bucketCol: Column =
    pmod(coalesce(col("user_id"), lit(0L)), lit(NBuckets.toLong))

  /** Materialize the live store: the events fixture hive-partitioned on
    * the user hash bucket. Run once per store path. */
  def buildStore(spark: SparkSession, dir: String, store: String): Unit =
    graft.Tables.events(spark, dir)
      .withColumn("bucket", bucketCol)
      .write.mode("overwrite").partitionBy("bucket").parquet(store)

  /** One exactly-once erasure tick: victims = rows matching `requested`
    * (null-safe — null user_ids never match). Rewrites only the buckets
    * the victims live in; tombstones land under this tick's partition. */
  def erasureTickXO(spark: SparkSession, store: String, tombs: String,
                    tickId: Long, requested: Column): Unit = {
    val safeReq = coalesce(requested, lit(false))
    val ev = spark.read.parquet(store)
    val victims = ev.filter(safeReq)
    val current = victims
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows_erased"))
    // REPLAY-SAFE tombstones: a replayed tick must not recompute counts
    // from the already-mutated store (a crash after a partial store
    // rewrite would drop or undercount tombstones for users whose rows
    // were already erased — silent deletion without a tombstone). Rows
    // the first run landed are authoritative where present (computed
    // pre-mutation); current victims cover any user the partial write
    // missed (the store still holds their rows). Per-user MAX of the
    // union reconstructs the pre-tick counts in every crash window:
    // store-untouched → current is complete; store-mutated → prior is.
    val tombTickPath = new org.apache.hadoop.fs.Path(tombs, s"tick=$tickId")
    val tfs = tombTickPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val replaySafe = (if (tfs.exists(tombTickPath))
        spark.read.parquet(tombTickPath.toString)
          .select(col("user_id"), col("n_rows_erased"))
          .unionByName(current)
          .groupBy(col("user_id"))
          .agg(max(col("n_rows_erased")).as("n_rows_erased"))
      else current).localCheckpoint(true) // materialize BEFORE overwriting what it read
    replaySafe.withColumn("tick", lit(tickId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("tick").parquet(tombs)
    // partition discovery types the bucket dir value as INT — cast up
    val hit = victims.select(col("bucket").cast("long")).distinct()
      .collect().map(_.getLong(0))
    if (hit.nonEmpty) {
      // replacement spills to scratch first: Spark cannot overwrite a
      // path that is also being read, and the spill is bucket-bounded
      val replacement = graft.sources.Sources.spillScratch(
        ev.filter(col("bucket").isin(hit: _*)).filter(!safeReq),
        s"erasure_tick_$tickId")
      // dynamic overwrite only replaces partitions the replacement still
      // has rows FOR — a bucket whose every row was erased would silently
      // keep its old files (the one failure mode an erasure rewrite must
      // not have; the spec's single-user-bucket plant catches it). Those
      // fully-erased partitions are deleted outright.
      val nonEmpty = replacement.select(col("bucket").cast("long"))
        .distinct().collect().map(_.getLong(0)).toSet
      if (nonEmpty.nonEmpty)
        replacement
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket").parquet(store)
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      (hit.toSet -- nonEmpty).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(store, s"bucket=$b"), true): Unit
      }
    }
  }

  /** The cumulative audit from the files read back (the q155 round-trip
    * contract): per erased subject, tombstoned rows across all ticks and
    * rows still present in the store. */
  def erasureAudit(spark: SparkSession, store: String, tombs: String): DataFrame = {
    val tomb = spark.read.parquet(tombs)
      .groupBy(col("user_id")).agg(sum(col("n_rows_erased")).as("n_rows_erased"))
    val remaining = spark.read.parquet(store)
      .join(broadcast(tomb.select(col("user_id"))), Seq("user_id"), "left_semi")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_rem"))
    tomb.join(remaining, Seq("user_id"), "left")
      .select(col("user_id"), col("n_rows_erased"),
        coalesce(col("n_rem"), lit(0L)).as("n_remaining"),
        (coalesce(col("n_rem"), lit(0L)) === 0L).as("purged"))
  }

  /** The registry fixture form: build the store, run three request ticks
    * (tick r erases user_id % 13 = r — disjoint, oracle-derivable sets),
    * audit cumulatively. Oracle = q177's SQL over the union request set. */
  def erasureTicks(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.sources.Sources.scratchDir(spark,
      s"erasure_stream_${java.util.UUID.randomUUID.toString.take(8)}")
    val store = s"$root/store"
    val tombs = s"$root/tombstones"
    // the pre-erasure bucketed store is deterministic fixture state; the
    // ticks MUTATE it, so it builds once per session and each invocation
    // works on a private file clone (the r21/r22 lifecycle-clone
    // discipline)
    val boot = graft.sources.Sources.ensureStore(spark, "erstore", dir) {
      p => buildStore(spark, dir, p)
    }
    graft.sources.Sources.cloneStoreDir(spark, boot, store)
    for (r <- 0L until 3L)
      erasureTickXO(spark, store, tombs, r, col("user_id") % 13 === r)
    erasureAudit(spark, store, tombs)
  }
}
