package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase-level wall-clock attribution for q228 (the BENCH_NOTES probe
  * discipline): replays the audit's phases one at a time so the trim
  * work lands on the phase that actually costs, not a guess. Usage:
  * runMain graft.tools.AnnStreamProbe [sfDir] */
object AnnStreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("graft-annprobe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.operators.Similarity._
    import graft.sources.Sources
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[annprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).persist()
    timed("warm corpus")(e.count())
    val isNew = col("vec_id") % 5 === 0
    val settled = e.filter(!isNew)
    val inSample = pmod(col("vec_id"), lit(8L)) === 0L
    val feed = Sources.scratchDirUnique(spark, "annprobe_feed")
    timed("spool feed") {
      for (b <- 0 until 3)
        e.filter(pmod(col("vec_id"), lit(15L)) === 5L * b).coalesce(1)
          .write.mode(if (b == 0) "overwrite" else "append").parquet(feed)
    }
    val cbPath = Sources.scratchDirUnique(spark, "annprobe_cb")
    val idxPath = Sources.scratchDirUnique(spark, "annprobe_idx")
    timed("ivf bootstrap")(writeIvfIndex(settled, cbPath, idxPath,
      trainOn = Some(settled.filter(inSample))))
    val booksPath = Sources.scratchDirUnique(spark, "annprobe_books")
    val codesPath = Sources.scratchDirUnique(spark, "annprobe_codes")
    timed("pq bootstrap")(writePqIndex(settled, booksPath, codesPath,
      trainIters = 1, trainOn = Some(settled.filter(inSample))))
    def start(writer: DataFrame =>
        org.apache.spark.sql.streaming.DataStreamWriter[
          org.apache.spark.sql.Row]) = {
      val src = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1").parquet(feed)
      writer(src).option("checkpointLocation",
        Sources.scratchDirUnique(spark, "annprobe_ck")).start()
    }
    timed("both streams") {
      val q1 = start(streamingIvfMaintenance(_, cbPath, idxPath))
      val q2 = start(streamingPqMaintenance(_, booksPath, codesPath))
      try { q1.processAllAvailable(); q2.processAllAvailable() }
      finally { q1.stop(); q2.stop() }
    }
    def mismatches(a: DataFrame, b: DataFrame): Long =
      graft.operators.Similarity.symmetricDiffCount(a, b)
    val cents = loadCentroids(spark, cbPath)
    def ivfStore() = spark.read.parquet(Sources.livePath(spark, idxPath))
    timed("ivf store compare") {
      mismatches(ivfStore().filter(inSample)
        .select(col("vec_id"), col("list_id")),
        ivfAssign(e.filter(inSample), cents)
          .select(col("vec_id"), col("list_id")))
    }
    timed("ivf replay leg") {
      val pre = ivfStore().filter(inSample).select(col("ingest_batch"),
        col("vec_id"), col("list_id")).localCheckpoint(true)
      ivfIngestTick(ivfStore().filter(col("ingest_batch") === 1L)
        .select(col("vec_id"), col("embedding")), cbPath, idxPath, 1L)
      mismatches(ivfStore().filter(inSample).select(col("ingest_batch"),
        col("vec_id"), col("list_id")), pre)
    }
    val books = loadPqBooks(spark, booksPath)
    val subDim = books(0)(0).length
    def pqStore() = spark.read.parquet(Sources.livePath(spark, codesPath))
    timed("pq store compare") {
      mismatches(pqStore().filter(inSample)
        .select(col("vec_id"), col("codes")),
        e.filter(inSample).select(col("vec_id"),
          pqEncode(col("embedding"), books, subDim).as("codes")))
    }
    timed("pq replay leg") {
      val pre = pqStore().filter(inSample).select(col("ingest_batch"),
        col("vec_id"), col("codes")).localCheckpoint(true)
      pqIngestTick(e.join(pqStore().filter(col("ingest_batch") === 1L)
          .select(col("vec_id")), Seq("vec_id"), "left_semi"),
        booksPath, codesPath, 1L)
      mismatches(pqStore().filter(inSample).select(col("ingest_batch"),
        col("vec_id"), col("codes")), pre)
    }
    timed("counts")((settled.count(), e.filter(isNew).count()))
    spark.stop()
  }
}
