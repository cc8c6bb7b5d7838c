package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Incremental dedup against a PERSISTED index — the dedup family
  * (SURVEY §2.5 D6/D8) promoted to the loop a continuously-ingesting
  * pipeline actually runs. Production curation is not a one-shot batch: new
  * shards arrive every hour and must dedup against the EXISTING corpus.
  * Re-shingling 100 TB of settled text per arriving shard is the wrong
  * plan; the right one keeps the (doc_id, shingle) index in a durable
  * parquet sink and joins each shard against the SINK. The reference's
  * incremental set-disjointness intent
  * (/root/reference/utils/preprocessing_testing_utils.py:60-80) is this
  * check run per-ingest instead of per-experiment.
  *
  * Scale shape:
  *   - the index sink IS the materialization: every plan branch that needs
  *     it (candidate join, hot-shingle df, per-doc sizes) re-reads the
  *     compact columnar parquet — column-pruned, splittable, and orders of
  *     magnitude smaller than re-tokenizing raw text — so the settled
  *     corpus is never re-shingled;
  *   - only the arriving shard (tiny by comparison) pays shingling, and
  *     its fingerprints are localCheckpointed once for the multi-branch
  *     plan;
  *   - candidate generation is the same cross-side inverted-index
  *     equi-join as the batch core ([[Dedup.jaccardPairsAcross]]) — the
  *     settled×settled quadrant is never enumerated, exactly as
  *     decontamination never enumerates train×train;
  *   - admitted docs APPEND their shingles to the sink (parquet append =
  *     new files, no rewrite), so the index stays current at the cost of
  *     the shard, not the corpus.
  */
object IncrementalDedup {

  /** Build and persist the shingle index of `docs` (overwrite). Run once
    * at corpus bootstrap; thereafter [[appendShingleIndex]] keeps it
    * current. */
  def writeShingleIndex(docs: DataFrame, path: String): Unit =
    Dedup.docShingles(docs).write.mode("overwrite").parquet(path)

  /** Append `docs`' shingles to an existing index sink — the per-ingest
    * index maintenance step (parquet append writes new files only). */
  def appendShingleIndex(docs: DataFrame, path: String): Unit =
    Dedup.docShingles(docs).write.mode("append").parquet(path)

  def readShingleIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Near-dup pairs of an already-shingled new side against the persisted
    * index: (doc_a = new doc, doc_b = indexed doc, jaccard ≥ threshold).
    * Hotness (the df cap that bounds the one quadratic bucket) is
    * corpus-wide — df over index ∪ shard — computed as one map-side-
    * combined aggregate over the single pruned `shingle` column of the
    * sink; at a scale where even that is too hot per-ingest, the df table
    * becomes its own maintained sidecar sink. Exposed shingled (rather
    * than as raw docs) so the same verb serves a winnowed-fingerprint
    * index: [[Dedup.jaccardPairsAcross]] keys on the `shingle` column
    * whatever its type.
    */
  def pairsAgainstIndex(shNew: DataFrame, index: DataFrame,
                        threshold: Double = 0.5, dfCap: Int = 1000): DataFrame = {
    val hot = shNew.unionByName(index)
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("shingle"))
    // shard and settled id spaces are disjoint in normal operation, so the
    // same-id exclusion is a no-op — it exists for at-least-once REPLAY
    // ([[streamingIngest]]): a re-delivered batch whose shingles were
    // already appended must not reject every doc against its own index
    // entry
    Dedup.jaccardPairsAcross(shNew, index, hot,
      col("doc_a") =!= col("doc_b"), threshold)
  }

  /** The per-shard dedup report: one row per NEW doc that near-duplicates
    * ANY indexed doc — its max Jaccard and how many settled docs it
    * collides with. Anti-joining the shard against these doc_ids is the
    * admission decision ([[admitFor]]). */
  def reportFor(newDocs: DataFrame, index: DataFrame,
                threshold: Double = 0.5, dfCap: Int = 1000): DataFrame =
    pairsAgainstIndex(Dedup.docShingles(newDocs).localCheckpoint(true),
        index, threshold, dfCap)
      .groupBy(col("doc_a").as("doc_id"))
      .agg(max(col("jaccard")).as("max_jaccard"),
        count(lit(1)).as("n_matches"))

  /** The admitted slice of an arriving shard: docs NOT near-duplicating
    * the settled corpus — what the pipeline appends to training data. */
  def admitFor(newDocs: DataFrame, index: DataFrame,
               threshold: Double = 0.5): DataFrame =
    newDocs.join(reportFor(newDocs, index, threshold).select(col("doc_id")),
      Seq("doc_id"), "left_anti")

  /** One full ingest tick: dedup the shard against the index, admit the
    * survivors, append their shingles to the index, return the admitted
    * docs. The admitted set is eagerly pinned (localCheckpoint) BEFORE the
    * append so the lazy plan cannot observe the index files it is about to
    * write — and intra-shard duplicates of an admitted doc are caught on
    * the NEXT tick's index, matching the settled-corpus-first contract.
    */
  def ingestShard(newDocs: DataFrame, indexPath: String,
                  threshold: Double = 0.5): DataFrame = {
    val spark = newDocs.sparkSession
    val admitted =
      admitFor(newDocs, readShingleIndex(spark, indexPath), threshold)
        .localCheckpoint(true)
    appendShingleIndex(admitted, indexPath)
    admitted
  }

  /** The ingest loop as a STREAM — the complete online curation pipeline:
    * each arriving micro-batch dedups against the persisted index
    * ([[ingestShard]]: report → admit → append), and the admitted docs
    * land in their own parquet sink. foreachBatch is the right harness:
    * the per-batch verbs are bounded batch computations, and the index
    * must RE-LIST its files per batch so batch t sees the fingerprints
    * batch t−1 admitted — a stream-static join would pin the listing at
    * query start. The stream carries ZERO Spark state (all state is the
    * durable index), so checkpointing makes the loop restartable. The
    * at-least-once caveat of plain parquet appends: a replayed batch can
    * duplicate admitted rows, and a doc admitted ALONGSIDE an intra-batch
    * near-dup can flip to rejected on replay (its twin is now in the
    * index — semantically consistent with settled-corpus-first, but not a
    * byte-identical replay). The same-id exclusion in
    * [[pairsAgainstIndex]] removes the worst artifact — a replayed doc
    * rejecting against its OWN index entry; an exactly-once sink would
    * close the rest.
    */
  def streamingIngest(docsStream: DataFrame, indexPath: String, admittedPath: String,
                      threshold: Double = 0.5): DataStreamWriter[Row] =
    docsStream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      ingestShard(batch, indexPath, threshold)
        .write.mode("append").parquet(admittedPath): Unit
    }

  // --- Bucketed index: the 100 TB form of the sink ---------------------
  //
  // The plain parquet index makes every per-ingest join on `shingle`
  // shuffle the INDEX side — the settled corpus — into the join's
  // partitioning, so ingest cost grows with the corpus, not the shard.
  // Writing the index BUCKETED (and sorted) by `shingle` inverts that:
  // the shard side shuffles into the index's bucketing and the index
  // streams bucket-aligned from disk — per-ingest shuffle is O(shard),
  // never O(corpus). A (doc_id, n_shingles) sizes sidecar is maintained
  // alongside so the report's size join reads one row per settled doc
  // instead of re-aggregating the shingle relation; the hot-shingle df is
  // likewise a bucket-local aggregate on the index side. (q46's bucketed
  // fact-fact join is the same layout argument applied to a query; this
  // is it applied to a MAINTAINED index.)

  private def shinglesTable(table: String) = table + "_shingles"
  private def sizesTable(table: String) = table + "_sizes"

  /** Build and persist the bucketed index + sizes sidecar (overwrite). */
  def writeShingleIndexBucketed(docs: DataFrame, table: String,
                                nBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    val sh = Dedup.docShingles(docs).localCheckpoint(true)
    graft.sources.Sources.resetWarehouseTable(spark, shinglesTable(table))
    graft.sources.Sources.resetWarehouseTable(spark, sizesTable(table))
    sh.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, "shingle").sortBy("shingle")
      .saveAsTable(shinglesTable(table))
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .write.mode("overwrite").format("parquet").saveAsTable(sizesTable(table))
  }

  /** Append a shard's shingles + sizes to the bucketed index. The append
    * must restate the bucket spec (Spark validates it against the table);
    * each append adds one file set per bucket — compaction cadence is the
    * operator's call, the join stays bucket-aligned regardless. */
  def appendShingleIndexBucketed(docs: DataFrame, table: String,
                                 nBuckets: Int = 32): Unit = {
    val sh = Dedup.docShingles(docs).localCheckpoint(true)
    sh.write.mode("append").format("parquet")
      .bucketBy(nBuckets, "shingle").sortBy("shingle")
      .saveAsTable(shinglesTable(table))
    sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .write.mode("append").format("parquet").saveAsTable(sizesTable(table))
  }

  /** The per-shard report against the BUCKETED index — identical contract
    * to [[reportFor]], different physics: candidate generation sort-merge
    * joins against the bucketed shingle table with no index-side
    * Exchange; per-doc sizes come from the sidecar; corpus-wide hotness
    * is the sum of a bucket-local index aggregate and the shard's own df
    * (doc ids are disjoint across sides, so the two counts add exactly
    * like the union-aggregate of the plain path). */
  def reportForBucketed(newDocs: DataFrame, table: String,
                        threshold: Double = 0.5, dfCap: Int = 1000): DataFrame = {
    val spark = newDocs.sparkSession
    val index = spark.table(shinglesTable(table))
    val shN = Dedup.docShingles(newDocs).localCheckpoint(true)
    val dfI = index.groupBy(col("shingle")).agg(count(lit(1)).as("dfi"))
    val dfN = shN.groupBy(col("shingle")).agg(count(lit(1)).as("dfn"))
    val hot = dfI.join(dfN, Seq("shingle"), "full_outer")
      .filter(coalesce(col("dfi"), lit(0L)) + coalesce(col("dfn"), lit(0L)) > dfCap)
      .select(col("shingle"))
    Dedup.jaccardPairsAcross(shN, index, hot,
        col("doc_a") =!= col("doc_b"), threshold,
        sizesBOpt = Some(spark.table(sizesTable(table))))
      .groupBy(col("doc_a").as("doc_id"))
      .agg(max(col("jaccard")).as("max_jaccard"),
        count(lit(1)).as("n_matches"))
  }

  /** One full ingest tick against the BUCKETED index — [[ingestShard]]
    * with the O(shard) shuffle profile; the [[streamingIngest]]
    * foreachBatch shape applies to this verb unchanged. */
  def ingestShardBucketed(newDocs: DataFrame, table: String,
                          threshold: Double = 0.5, nBuckets: Int = 32): DataFrame = {
    val admitted = newDocs.join(
        reportForBucketed(newDocs, table, threshold).select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    appendShingleIndexBucketed(admitted, table, nBuckets)
    admitted
  }

  /** q66 fixture entry: q64's split and oracle, forced through the
    * bucketed index — the layout's shuffle inversion is re-proven against
    * the same batch oracle every harness run. */
  def incrementalDedupReportBucketed(spark: SparkSession, dir: String,
                                     threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isNew = col("doc_id") % 7 === 0
    val table = "graft_shidx_" +
      java.lang.Integer.toHexString(dir.hashCode) + "_" +
      graft.sources.Sources.sessionTag(spark)
    writeShingleIndexBucketed(docs.filter(!isNew), table)
    reportForBucketed(docs.filter(isNew), table, threshold)
  }

  /** q64 fixture entry: settled corpus = doc_id % 7 ≠ 0, arriving shard =
    * the rest (~14%). The index is written once to a session scratch sink
    * and the shard dedups against the SINK — the settled corpus text is
    * shingled exactly once, at index-build time (IncrementalDedupSpec
    * pins that the report's only file scans read the index path). */
  def incrementalDedupReport(spark: SparkSession, dir: String,
                             threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isNew = col("doc_id") % 7 === 0
    val path = graft.sources.Sources.scratchDir(spark,
      "shingle_index_" + java.lang.Integer.toHexString(dir.hashCode))
    writeShingleIndex(docs.filter(!isNew), path)
    reportFor(docs.filter(isNew), readShingleIndex(spark, path), threshold)
  }
}
