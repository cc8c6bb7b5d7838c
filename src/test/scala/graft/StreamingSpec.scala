package graft

import graft.streaming.EventWindows
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Executes the Structured Streaming twins against a memory sink and checks
  * they agree with their batch counterparts — batch and stream share
  * operator semantics by construction (same plan modulo the watermark).
  */
class StreamingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def runToCompletion(q: org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row]): Unit = {
    val query = q.trigger(Trigger.AvailableNow()).start()
    query.awaitTermination(120000)
    assert(!query.isActive, "stream did not drain within 120s")
  }

  test("streaming tumbling counts equal the batch twin") {
    runToCompletion(
      EventWindows.streamingTumblingCounts(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_tumbling").outputMode("complete"))
    val streamed = spark.sql("SELECT window_start_ms, event_type, cnt FROM stream_tumbling")
    val batch = EventWindows.tumblingCounts(spark, TestSpark.Sf0001)
      .select(col("window_start_ms"), col("event_type"), col("cnt"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming sliding counts equal the batch twin") {
    runToCompletion(
      EventWindows.streamingSlidingCounts(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_sliding").outputMode("complete"))
    val streamed = spark.sql("SELECT window_start_ms, event_type, cnt FROM stream_sliding")
    val batch = EventWindows.slidingCounts(spark, TestSpark.Sf0001)
      .select(col("window_start_ms"), col("event_type"), col("cnt"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming session windows emit exactly the closed sessions of the batch twin") {
    runToCompletion(
      EventWindows.streamingSessionCounts(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_sessions").outputMode("append"))
    val streamed = spark.sql(
      "SELECT user_id, session_start_ms, n_events, sum_value FROM stream_sessions")
    val batch = EventWindows.sessionCounts(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("session_start_ms"), col("n_events"), col("sum_value"))
    // append mode withholds sessions still open at the final watermark
    // (max event time − 1 h), so streamed ⊆ batch with only the tail missing
    assert(streamed.exceptAll(batch).count() == 0, "streamed sessions must all exist in batch")
    val sCount = streamed.count().toDouble
    val bCount = batch.count().toDouble
    assert(sCount >= 0.9 * bCount, s"only $sCount of $bCount sessions emitted")
  }

  test("q93 streaming packing: MemoryStream micro-batches reproduce the batch manifest; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.SequencePackingStream
    import spark.implicits._
    val mPath = graft.sources.Sources.scratchDir(spark, "spec_pack_manifest")
    val tPath = graft.sources.Sources.scratchDir(spark, "spec_pack_totals")
    for (p <- Seq(mPath, tPath)) {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    }
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
    // three genuine micro-batches in arrival (= doc_id) order
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = SequencePackingStream
      .streamingSequencePacking(stream, mPath, tPath)
      .start()
    try {
      docs.grouped((docs.length + 2) / 3).foreach { g =>
        input.addData(g.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def manifest() = spark.read.parquet(mPath)
      .select(col("doc_id"), col("n_tokens"), col("first_chunk"),
        col("last_chunk"), col("n_chunks"))
    val batchTwin = graft.operators.TextAnalysis.sequencePacking(spark, TestSpark.Sf0001)
    assert(manifest().exceptAll(batchTwin).count() == 0)
    assert(batchTwin.exceptAll(manifest()).count() == 0)
    // replay the MIDDLE tick out of band (same batch id 1): the XO layout
    // must rewrite identical content, not shift offsets or duplicate rows
    val before = manifest().collect().map(_.toSeq).toSet
    val tick1 = docs.grouped((docs.length + 2) / 3).toSeq(1)
    SequencePackingStream.packShardXO(
      spark.createDataset(tick1.toIndexedSeq).toDF("doc_id", "text"), 1L, mPath, tPath)
    assert(manifest().collect().map(_.toSeq).toSet == before)
  }

  test("mapGroupsWithState per-user totals match the batch aggregation") {
    runToCompletion(
      EventWindows.streamingUserTotals(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_user_totals").outputMode("update"))
    // update mode emits a row per key per batch, and the event-time-timeout
    // machinery runs an extra batch that re-emits final totals for keys it
    // evicts — all emissions for a key carry the same final values here
    // (one data batch), so distinct rows = one per user
    val streamed = spark.sql(
      "SELECT user_id, n_events, total_value FROM stream_user_totals").distinct()
    val batch = Tables.events(spark, TestSpark.Sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events_b"), sum(col("value")).as("total_b"))
    // double accumulation order differs between the stateful stream and the
    // batch hash aggregate, so totals compare with an fp tolerance
    val joined = streamed.join(batch, "user_id")
    assert(joined.count() == batch.count(),
      "every user must appear with exactly one distinct totals row")
    assert(joined.filter(col("n_events") =!= col("n_events_b")).count() == 0)
    assert(joined.filter(abs(col("total_value") - col("total_b")) > 1e-6).count() == 0)
  }

  test("flatMapGroupsWithState sessionizer emits batch sessions minus each user's open tail") {
    runToCompletion(
      EventWindows.streamingCustomSessionize(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_custom_sessions").outputMode("append"))
    val streamed = spark.sql(
      "SELECT user_id, session_start_ms, n_events, sum_value FROM stream_custom_sessions")
    val batch = EventWindows.sessionCounts(spark, TestSpark.Sf0001)
    // every in-batch-closed session (all but each user's trailing one) must
    // emit with boundaries identical to the batch twin; the event-time
    // timeout may then ALSO close-and-emit trailing sessions the final
    // watermark passed, so streamed sits between "all but tails" and "all"
    // — and never outside the batch session set
    val batchW = Window.partitionBy(col("user_id")).orderBy(col("session_start_ms").desc)
    val allButTails = batch
      .withColumn("rn", row_number().over(batchW))
      .filter(col("rn") > 1)
      .select(col("user_id"), col("session_start_ms"), col("n_events"))
    val got = streamed.select(col("user_id"), col("session_start_ms"), col("n_events"))
    val batchKeys = batch.select(col("user_id"), col("session_start_ms"), col("n_events"))
    assert(got.exceptAll(batchKeys).count() == 0,
      "streamed sessions must all exist in batch with identical boundaries")
    assert(allButTails.exceptAll(got).count() == 0,
      "every in-batch-closed session must emit")
    // values: fp-tolerant against the batch twin's rounded sums
    val joined = streamed.join(batch, Seq("user_id", "session_start_ms"))
    assert(joined.filter(
      abs(streamed("sum_value") - batch("sum_value")) > 0.011).count() == 0)
  }

  // --- event-time eviction of custom GroupState (multi-batch, MemoryStream) ---

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  /** (user_id, ts_ms, value) memory stream → the (user_id, ts, value)
    * frame the eviction operators consume. */
  private def memoryEvents(): (MemoryStream[(Long, Long, Double)], org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val ev = input.toDF().toDF("user_id", "ts_ms", "value")
      .select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"), col("value"))
    (input, ev)
  }

  private val T0 = 1700000000000L // fixed epoch anchor for the planted batches
  private val Hour = 3600000L

  test("user totals: a watermark-evicted key re-initializes instead of resuming") {
    import spark.implicits._
    val (input, ev) = memoryEvents()
    val q = EventWindows.userTotalsWithEviction(ev, watermarkDelay = "1 hour",
        ttlMs = 2 * Hour)
      .writeStream.format("memory").queryName("evict_totals").outputMode("update").start()
    try {
      input.addData((1L, T0, 1.0), (1L, T0 + 1000L, 2.0)) // user 1: n=2, total=3
      q.processAllAvailable()
      input.addData((2L, T0 + 10 * Hour, 1.0)) // advances watermark to T0+9h
      q.processAllAvailable()
      input.addData((2L, T0 + 12 * Hour, 1.0)) // batch 3: user 1 (timeout T0+2h) fires
      q.processAllAvailable()
      input.addData((1L, T0 + 12 * Hour, 5.0)) // user 1 returns AFTER eviction
      q.processAllAvailable()
    } finally q.stop()
    val u1 = spark.sql("SELECT n_events, total_value FROM evict_totals WHERE user_id = 1")
      .as[(Long, Double)].collect().toSet
    assert(u1.contains((1L, 5.0)),
      s"user 1 must re-initialize from zero after eviction, got $u1")
    assert(!u1.contains((3L, 8.0)),
      s"user 1 state resumed across eviction (n=3 seen): $u1")
  }

  test("sessionizer: the watermark closes, emits, and evicts an idle open session") {
    import spark.implicits._
    val (input, ev) = memoryEvents()
    val q = EventWindows.customSessionizeWithEviction(ev, gapMs = Hour)
      .writeStream.format("memory").queryName("evict_sessions").outputMode("append").start()
    try {
      input.addData((1L, T0, 1.5)) // user 1 opens a session, then goes idle
      q.processAllAvailable()
      input.addData((2L, T0 + 10 * Hour, 1.0)) // advances watermark past T0+gap
      q.processAllAvailable()
      input.addData((2L, T0 + 12 * Hour, 1.0)) // timeout fires for user 1
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.sql(
      "SELECT user_id, session_start_ms, n_events, sum_value FROM evict_sessions")
      .as[(Long, Long, Long, Double)].collect().toSet
    // user 1's session was never closed by a later event of its own — only
    // the event-time timeout can have emitted it
    assert(sessions.contains((1L, T0, 1L, 1.5)),
      s"idle open session must close via watermark eviction, got $sessions")
  }

  test("sessionizer: a late event wholly before the open session emits as its own session") {
    import spark.implicits._
    val (input, ev) = memoryEvents()
    // huge watermark delay keeps the 5h-late event above the watermark
    val q = EventWindows.customSessionizeWithEviction(ev, gapMs = Hour,
        watermarkDelay = "48 hours")
      .writeStream.format("memory").queryName("late_own_session").outputMode("append").start()
    try {
      input.addData((1L, T0 + 10 * Hour, 1.0)) // open session at T0+10h
      q.processAllAvailable()
      // late cross-batch event 5h BEFORE the open session's interval:
      // batch session_window puts it in its own session — it must emit as
      // one, never merge into (and rewind) the live session
      input.addData((1L, T0 + 5 * Hour, 2.5))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.sql(
      "SELECT user_id, session_start_ms, n_events, sum_value FROM late_own_session")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(sessions.contains((1L, T0 + 5 * Hour, 1L, 2.5)),
      s"too-old late event must emit as its own closed session, got $sessions")
    assert(!sessions.exists(s => s._2 == T0 + 5 * Hour && s._3 > 1L),
      s"live session must not rewind to the late event's start: $sessions")
  }

  test("sessionizer: same-batch late events within the gap merge into ONE earlier session") {
    import spark.implicits._
    val (input, ev) = memoryEvents()
    val q = EventWindows.customSessionizeWithEviction(ev, gapMs = Hour,
        watermarkDelay = "48 hours")
      .writeStream.format("memory").queryName("late_merged_session").outputMode("append").start()
    try {
      input.addData((1L, T0 + 10 * Hour, 1.0)) // open session at T0+10h
      q.processAllAvailable()
      // two late events 30 min apart, both wholly before the open session,
      // in the SAME batch: batch session_window merges them — so must we
      input.addData((1L, T0 + 5 * Hour, 2.0), (1L, T0 + 5 * Hour + 30 * 60000L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.sql(
      "SELECT user_id, session_start_ms, n_events, sum_value FROM late_merged_session")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(sessions.contains((1L, T0 + 5 * Hour, 2L, 5.0)),
      s"same-batch mergeable late events must emit as one session, got $sessions")
    assert(!sessions.exists(s => s._2 == T0 + 5 * Hour && s._3 == 1L),
      s"late events must not emit as singletons when they merge in batch semantics: $sessions")
  }

  test("sessionizer: a late chain that bridges into the open session merges completely") {
    import spark.implicits._
    val (input, ev) = memoryEvents()
    val q = EventWindows.customSessionizeWithEviction(ev, gapMs = Hour,
        watermarkDelay = "48 hours")
      .writeStream.format("memory").queryName("late_bridged_session").outputMode("append").start()
    try {
      input.addData((1L, T0 + 10 * Hour, 1.0)) // open session at T0+10h
      q.processAllAvailable()
      // same batch: 8:30 is wholly before the open interval (pending), but
      // 9:15 merges into the open session and REWINDS its start to 9:15 —
      // bringing 8:30 within gap reach. Batch session_window merges all
      // three into one session; the pending chain must fold in, not flush
      // as a separate singleton.
      input.addData((1L, T0 + 8 * Hour + 30 * 60000L, 2.0),
        (1L, T0 + 9 * Hour + 15 * 60000L, 3.0))
      q.processAllAvailable()
      input.addData((2L, T0 + 60 * Hour, 1.0)) // watermark → T0+12h
      q.processAllAvailable()
      input.addData((2L, T0 + 61 * Hour, 1.0)) // user 1 timeout fires
      q.processAllAvailable()
    } finally q.stop()
    val sessions = spark.sql(
      "SELECT user_id, session_start_ms, n_events, sum_value FROM late_bridged_session")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(sessions.contains((1L, T0 + 8 * Hour + 30 * 60000L, 3L, 6.0)),
      s"bridged chain must merge into one [8:30, 10:00] session, got $sessions")
    assert(!sessions.exists(s => s._1 == 1L && s._3 < 3L),
      s"no fragment of the bridged chain may emit separately: $sessions")
  }

  test("checkpoint recovery: stateful totals resume across a stop/restart and eviction still fires") {
    // the property a production pipeline actually relies on: kill the
    // query, restart from the durable checkpoint, and the per-key state
    // (counts, totals, timeout clocks) continues as if never stopped.
    // foreachBatch is the restart-capable sink (memory sinks aren't).
    val (input, ev) = memoryEvents()
    val ckpt = graft.sources.Sources.scratchDir(spark, "recovery_ckpt")
    val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long, Double)]()
    def start() = EventWindows.userTotalsWithEviction(ev, watermarkDelay = "1 hour",
        ttlMs = 2 * Hour)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getDouble(2)))): Unit
      }
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    val q1 = start()
    try {
      input.addData((1L, T0, 1.0), (1L, T0 + 1000L, 2.0)) // user 1: n=2, total=3
      q1.processAllAvailable()
    } finally q1.stop()
    assert(got.contains((1L, 2L, 3.0)), s"pre-restart totals missing: $got")
    input.addData((1L, T0 + 2000L, 4.0)) // arrives while the query is DOWN
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.contains((1L, 3L, 7.0)),
        s"state must recover from the checkpoint (n=3, total=7 = continue, not restart): $got")
      input.addData((2L, T0 + 10 * Hour, 1.0)) // advances watermark to T0+9h
      q2.processAllAvailable()
      input.addData((2L, T0 + 12 * Hour, 1.0)) // user 1 (timeout T0+2h2s) fires
      q2.processAllAvailable()
      input.addData((1L, T0 + 12 * Hour, 5.0)) // user 1 returns AFTER eviction
      q2.processAllAvailable()
    } finally q2.stop()
    assert(got.contains((1L, 1L, 5.0)),
      s"recovered state must still evict on event-time timeout and re-initialize: $got")
    assert(!got.contains((1L, 4L, 12.0)),
      s"user 1 state resumed across eviction (n=4 seen): $got")
  }

  test("streaming parquet sink: append-mode windows land as readable files") {
    // the real sink a pipeline runs (memory sinks are test scaffolding):
    // watermarked tumbling counts → parquet + checkpoint; append mode
    // emits only watermark-finalized windows, so the files hold a subset
    // of the batch twin's rows with identical values, missing at most the
    // final (unfinalized) watermark's worth of windows
    val out = graft.sources.Sources.scratchDir(spark, "stream_sink")
    val ckpt = graft.sources.Sources.scratchDir(spark, "stream_sink_ckpt")
    runToCompletion(
      EventWindows.streamingTumblingCounts(spark, TestSpark.Sf0001)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append"))
    val sunk = spark.read.parquet(out)
      .select(col("window_start_ms"), col("event_type"), col("cnt"))
    val batch = EventWindows.tumblingCounts(spark, TestSpark.Sf0001)
      .select(col("window_start_ms"), col("event_type"), col("cnt"))
    assert(sunk.exceptAll(batch).count() == 0,
      "every sunk row must match the batch twin exactly")
    val (s, b) = (sunk.count().toDouble, batch.count().toDouble)
    assert(s >= 0.9 * b, s"only $s of $b finalized windows reached the sink")
  }

  test("stream-stream interval join emits exactly the batch range-join pairs") {
    import spark.implicits._
    runToCompletion(
      EventWindows.streamingIntervalJoin(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_interval").outputMode("append"))
    val streamed = spark.sql("SELECT user_id, click_ms, view_ms FROM stream_interval")
      .as[(Long, Long, Long)].collect().toSet
    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    val batch = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms").as("click_ms"))
      .join(ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ms").as("view_ms")), "user_id")
      .filter(col("view_ms") >= col("click_ms") - 1800000L
        && col("view_ms") < col("click_ms"))
      .select(col("user_id"), col("click_ms"), col("view_ms"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream-stream join diverged: only-streamed=${(streamed -- batch).size}, " +
        s"only-batch=${(batch -- streamed).size} of ${batch.size}")
  }

  test("streaming dedup-within-watermark passes every unique event exactly once") {
    runToCompletion(
      EventWindows.streamingDedup(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_dedup").outputMode("append"))
    val streamed = spark.sql("SELECT event_id FROM stream_dedup")
    val nEvents = Tables.events(spark, TestSpark.Sf0001).count()
    assert(streamed.count() == nEvents) // fixture event_ids are unique
    assert(streamed.distinct().count() == nEvents)
  }

  test("streaming decontamination emits exactly the batch report") {
    // the online ingest filter is stateless (broadcast eval index, in-row
    // scoring, no watermark), so append mode withholds nothing and the
    // drained stream must equal the batch report row-for-row
    runToCompletion(
      graft.operators.Dedup.streamingDecontamination(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_decontam").outputMode("append"))
    val streamed = spark.sql(
      "SELECT doc_id, max_jaccard, exact_hit FROM stream_decontam")
    val batch = graft.operators.Dedup.decontaminationReport(spark, TestSpark.Sf0001)
    assert(streamed.exceptAll(batch).count() == 0,
      "streamed rows missing from the batch report")
    assert(batch.exceptAll(streamed).count() == 0,
      "batch rows missing from the stream")
  }

  test("q105 streaming funnel: stage counts equal the batch funnel on the fixture") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fixture = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)].collect()
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val ev = input.toDF().toDF("user_id", "ts", "event_type")
    // huge delay: cross-batch disorder must never be dropped as late
    val q = EventWindows.conversionFunnelStream(ev, watermarkDelay = "3650 days")
      .writeStream.format("memory").queryName("stream_funnel").outputMode("append").start()
    try {
      // adversarial arrival order: later half of event time arrives FIRST
      val sorted = fixture.sortBy(_._2.getTime)
      val (early, late) = sorted.splitAt(sorted.length / 2)
      input.addData(late.toSeq); q.processAllAvailable()
      input.addData(early.toSeq); q.processAllAvailable()
      // sentinel advances the watermark past every fixture event
      val maxTs = sorted.last._2.getTime
      input.addData((-1L, new java.sql.Timestamp(maxTs + 4000L * 86400000L), "error"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.sql("SELECT user_id, stage_idx FROM stream_funnel")
      .as[(Long, Int)].collect()
    // one emission per (user, stage) ever
    assert(streamed.distinct.length == streamed.length, "duplicate stage emissions")
    val gotCounts = streamed.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val batch = EventWindows.conversionFunnel(spark, TestSpark.Sf0001)
      .as[(Long, String, Long)].collect()
    batch.foreach { case (idx, stage, n) =>
      assert(gotCounts.getOrElse(idx.toInt, 0L) == n, s"stage $idx $stage")
    }
    assert(gotCounts.keySet == batch.map(_._1.toInt).toSet)
  }

  test("q105 streaming funnel: a late-arriving earlier view requalifies the click") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val ev = input.toDF().toDF("user_id", "ts", "event_type")
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val q = EventWindows.conversionFunnelStream(ev, watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("stream_funnel_late").outputMode("append").start()
    try {
      // click arrives BEFORE the view exists in the stream; an eager state
      // machine would discard it (no stage-0 time yet). The view then
      // arrives in a later batch with an EARLIER event time, still above
      // the watermark. Watermark-ordered finalization must count both.
      input.addData((1L, ts(T0 + 2 * Hour), "click")); q.processAllAvailable()
      input.addData((1L, ts(T0 + Hour + 30 * 60000L), "view")); q.processAllAvailable()
      input.addData((1L, ts(T0 + 3 * Hour), "purchase")); q.processAllAvailable()
      input.addData((2L, ts(T0 + 100 * Hour), "view")) // watermark sentinel
      q.processAllAvailable()
    } finally q.stop()
    val hits = spark.sql("SELECT user_id, stage_idx, ts_us FROM stream_funnel_late WHERE user_id = 1")
      .as[(Long, Int, Long)].collect().sortBy(_._2)
    assert(hits.map(_._2).toSeq == Seq(0, 1, 2),
      s"user 1 must complete all three stages, got ${hits.toSeq}")
    assert(hits.map(_._3).toSeq == Seq(
      (T0 + Hour + 30 * 60000L) * 1000L, (T0 + 2 * Hour) * 1000L, (T0 + 3 * Hour) * 1000L))
  }

  test("q133 streaming reservoir == batch bottom-k; sharding-independent; replay no-op") {
    import graft.streaming.ReservoirSampleStream
    import graft.operators.Sampling
    import spark.implicits._
    val dir = TestSpark.Sf0001
    val got = ReservoirSampleStream.reservoirMultiTick(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    val batch = Sampling.stratumCapSample(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    assert(got == batch, "multi-tick merge must equal the batch bottom-k")
    assert(got.nonEmpty)
    // a completely different sharding (parity split, 2 ticks) converges to
    // the same reservoir — arrival order/partitioning irrelevance
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
    val path = java.nio.file.Files
      .createTempDirectory("reservoir-spec").toString
    ReservoirSampleStream.sampleTickXO(
      docs.filter(col("doc_id") % 2 === 0), 0L, path)
    ReservoirSampleStream.sampleTickXO(
      docs.filter(col("doc_id") % 2 === 1), 1L, path)
    val parity = ReservoirSampleStream.currentSample(spark, path)
      .as[(Long, String, Long)].collect().toSet
    assert(parity == batch, "sharding must not change the reservoir")
    // replaying a tick rewrites its own partition: row set unchanged
    ReservoirSampleStream.sampleTickXO(
      docs.filter(col("doc_id") % 2 === 1), 1L, path)
    val replayed = ReservoirSampleStream.currentSample(spark, path)
      .as[(Long, String, Long)].collect().toSet
    assert(replayed == batch, "replayed tick must be a no-op")
    // compaction folds the store to the settled partition, sample intact,
    // and a post-compaction tick still merges correctly (the semilattice
    // property compaction relies on)
    ReservoirSampleStream.compactReservoir(spark, path)
    // the blue/green swap moved the store: list the LIVE generation
    val folded = new java.io.File(
        graft.sources.Sources.livePath(spark, path)).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(folded == Set("ingest_batch=-1"))
    assert(ReservoirSampleStream.currentSample(spark, path)
      .as[(Long, String, Long)].collect().toSet == batch,
      "compaction must preserve the sample")
    ReservoirSampleStream.sampleTickXO(
      docs.filter(col("doc_id") % 2 === 1), 2L, path) // re-offer old docs
    assert(ReservoirSampleStream.currentSample(spark, path)
      .as[(Long, String, Long)].collect().toSet == batch,
      "post-compaction merge must still equal the batch bottom-k")
  }

  test("q133 reservoir store records its write-time k; over-k merges fail loudly") {
    import graft.streaming.ReservoirSampleStream
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("lang"))
    val path = java.nio.file.Files
      .createTempDirectory("reservoir-k-spec").toString
    ReservoirSampleStream.sampleTickXO(docs, 0L, path, k = 10)
    // a merge at k' <= write-time k is the exact bottom-k'
    assert(ReservoirSampleStream.currentSample(spark, path, k = 10).count() > 0L)
    assert(ReservoirSampleStream.currentSample(spark, path, k = 3).count() > 0L)
    // a LARGER k' would silently return an underfilled reservoir — the
    // store's sidecar makes it throw instead
    val e = intercept[IllegalArgumentException] {
      ReservoirSampleStream.currentSample(spark, path, k = 11)
    }
    assert(e.getMessage.contains("bottom-10"))
    // ticks at a different geometry than the store's are refused too
    intercept[IllegalArgumentException] {
      ReservoirSampleStream.sampleTickXO(docs, 1L, path, k = 20)
    }
    intercept[IllegalArgumentException] {
      ReservoirSampleStream.currentSample(spark, path, k = 5, seed = 7L)
    }
    // compaction at a smaller k SHRINKS the recorded k: what was folded
    // away can never be silently asked for again
    ReservoirSampleStream.compactReservoir(spark, path, k = 5)
    assert(ReservoirSampleStream.currentSample(spark, path, k = 5).count() > 0L)
    intercept[IllegalArgumentException] {
      ReservoirSampleStream.currentSample(spark, path, k = 6)
    }
  }

  test("q140 drift tick on an EMPTY micro-batch lands a defined (0, ln 2) alarm row") {
    import graft.streaming.DriftMonitorStream
    import spark.implicits._
    val docs = graft.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text"))
    val ref = DriftMonitorStream.tokenCounts(docs)
    val path = java.nio.file.Files
      .createTempDirectory("drift-empty-spec").toString
    // a trigger with no arrivals — the real foreachBatch possibility
    DriftMonitorStream.driftTickXO(docs.filter(col("doc_id") < 0), 7L, path, ref)
    val rows = spark.read.parquet(path)
      .select(col("ingest_batch").cast("long"), col("n_tokens"),
        col("js_divergence"))
      .as[(Long, Long, Double)].collect()
    assert(rows.toSeq == Seq((7L, 0L, math.log(2.0))),
      "empty tick must land the defined maximal-divergence row, never nulls")
    // an all-empty-text batch degenerates the same way … (tokens of "" are
    // the empty-string token, so craft a truly tokenless batch via filter)
    // and a NON-empty tick beside it still computes a finite JS
    DriftMonitorStream.driftTickXO(docs.limit(5), 8L, path, ref)
    val t8 = spark.read.parquet(path)
      .filter(col("ingest_batch") === 8L)
      .select(col("n_tokens"), col("js_divergence"))
      .as[(Long, Double)].head()
    assert(t8._1 > 0L && !t8._2.isNaN && t8._2 >= 0.0 && t8._2 <= math.log(2.0))
  }

  test("q140 streaming drift: per-tick JS recompute; zero on identical marginal; replay") {
    import graft.streaming.DriftMonitorStream
    import spark.implicits._
    val dir = TestSpark.Sf0001
    val corpus = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def counts(rows: Seq[(Long, String)]): Map[String, Long] =
      rows.flatMap(_._2.split(" ", -1)).groupBy(identity)
        .map { case (t, xs) => t -> xs.length.toLong }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def js(a: Map[String, Long], b: Map[String, Long]): Double = {
      val (na, nb) = (a.values.sum.toDouble, b.values.sum.toDouble)
      (a.keySet ++ b.keySet).toSeq.map { t =>
        val p = a.getOrElse(t, 0L) / na
        val q = b.getOrElse(t, 0L) / nb
        val m = (p + q) / 2.0
        (if (p > 0) p * math.log(p / m) else 0.0) +
          (if (q > 0) q * math.log(q / m) else 0.0)
      }.sum / 2.0
    }
    val ref = counts(corpus.filter(_._1 % 5 != 0).toSeq)
    val maxId = corpus.map(_._1).max
    val (c1, c2) = (maxId / 3, 2 * maxId / 3)
    val shards = Seq(
      corpus.filter(_._1 <= c1).toSeq,
      corpus.filter(r => r._1 > c1 && r._1 <= c2).toSeq,
      corpus.filter(_._1 > c2).toSeq)
    val want = shards.zipWithIndex.map { case (rows, i) =>
      (i.toLong, rows.map(_._2.split(" ", -1).length.toLong).sum, r6(js(counts(rows), ref)))
    }.toSet
    // multi-tick (includes a replayed tick 1) equals the per-shard recompute
    val got = DriftMonitorStream.driftMultiTick(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got.map(r => (r._1, r._2)) == want.map(r => (r._1, r._2)))
    got.foreach { g =>
      val w = want.find(_._1 == g._1).get
      assert(math.abs(g._3 - w._3) <= 1e-6, s"tick ${g._1} js")
      assert(g._3 > 0.0, s"tick ${g._1} should drift from the reference")
    }
    // a batch whose marginal IS the reference marginal has JS exactly 0
    val path = java.nio.file.Files.createTempDirectory("drift-spec").toString
    val refDocs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") % 5 =!= 0)
    DriftMonitorStream.driftTickXO(refDocs, 0L,
      path, DriftMonitorStream.tokenCounts(refDocs))
    val zero = spark.read.parquet(path).select(col("js_divergence"))
      .as[Double].head()
    assert(zero == 0.0)
  }

  test("q161 streaming shard export: MemoryStream ticks reproduce the batch manifest; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.ShardExportStream
    import spark.implicits._
    val sPath = graft.sources.Sources.scratchDir(spark, "spec_export_shards")
    val tPath = graft.sources.Sources.scratchDir(spark, "spec_export_totals")
    for (p <- Seq(sPath, tPath)) {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    }
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val stream = input.toDF().toDF("doc_id", "lang", "text")
    val q = ShardExportStream
      .streamingShardExport(stream, sPath, tPath)
      .start()
    try {
      docs.grouped((docs.length + 2) / 3).foreach { g =>
        input.addData(g.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def manifest() = ShardExportStream.currentManifest(spark, sPath)
    // stream ≡ batch: the cross-batch manifest equals the one-shot export
    val batchTwin = graft.sources.Sources
      .jsonlShardExport(spark, TestSpark.Sf0001)
    assert(manifest().exceptAll(batchTwin).count() == 0)
    assert(batchTwin.exceptAll(manifest()).count() == 0)
    // replay the MIDDLE tick out of band: XO partitions rewrite identical
    // content — shard ids must not shift and rows must not duplicate
    val before = manifest().collect().map(_.toSeq).toSet
    val tick1 = docs.grouped((docs.length + 2) / 3).toSeq(1)
    ShardExportStream.exportTickXO(
      spark.createDataset(tick1.toIndexedSeq).toDF("doc_id", "lang", "text"),
      1L, sPath, tPath)
    assert(manifest().collect().map(_.toSeq).toSet == before)
    // split-independence: the 3-tick fixture form lands the same manifest
    val ticks = ShardExportStream.shardExportTicks(spark, TestSpark.Sf0001)
    assert(ticks.exceptAll(batchTwin).count() == 0)
    assert(batchTwin.exceptAll(ticks).count() == 0)
  }

  test("q170 streaming k-anonymity gate: MemoryStream ticks equal batch under any split; replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.KAnonymityGateStream
    import graft.operators.Relational
    import spark.implicits._
    val cPath = graft.sources.Sources.scratchDir(spark, "spec_kanon_counts")
    val hp = new org.apache.hadoop.fs.Path(cPath)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    val cust = Tables.customer(spark, TestSpark.Sf0001)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      .as[(Long, String, Int, Double, String)].collect()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Int, Double, String)]
    val stream = input.toDF()
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val q = KAnonymityGateStream.streamingGate(stream, cPath).start()
    try {
      // PARITY split (2 uneven ticks) — deliberately different from the
      // fixture form's thirds: counts sum, so any split must converge
      Seq(cust.filter(_._1 % 2 == 0), cust.filter(_._1 % 2 == 1)).foreach { g =>
        input.addData(g.toIndexedSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    def audit() = KAnonymityGateStream.currentAudit(spark, cPath)
    val batch = Relational.kAnonymityAudit(spark, TestSpark.Sf0001)
    assert(audit().exceptAll(batch).count() == 0)
    assert(batch.exceptAll(audit()).count() == 0)
    // replay tick 0 out of band: the XO partition rewrite must not
    // double-count any class
    val before = audit().collect().map(_.toSeq).toSet
    KAnonymityGateStream.gateTickXO(
      spark.createDataset(cust.filter(_._1 % 2 == 0).toIndexedSeq)
        .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      0L, cPath)
    assert(audit().collect().map(_.toSeq).toSet == before)
    // the thirds fixture form converges to the same audit (split-independence)
    val thirds = graft.streaming.KAnonymityGateStream.gateTicks(spark, TestSpark.Sf0001)
    assert(thirds.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(thirds).count() == 0)
  }

  test("q183 streaming release: settled-corpus-first admission, hash/decon blocking, replay no-op") {
    import graft.streaming.ReleaseStream
    import spark.implicits._
    // 55-token all-alpha texts pass every cascade gate; variants change
    // one word -> Jaccard ~0.96, far above the 0.5 admission threshold
    def text(tag: String, last: String = "zz"): String = {
      val words = (for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$tag$a$b").take(53)
      ("the" +: words :+ s"the $tag$last").mkString(" ")
    }
    // train ids avoid % 10 == 0 (that's the eval split); maxId 89 ->
    // tick cuts t1 = 29, t2 = 59
    val docs = Seq(
      11L -> text("ta"),          // tick0: admitted
      12L -> text("tb"),          // tick0: admitted
      15L -> text("tb", "qq"),    // tick0: near-dup of 12 WITHIN the tick
                                  //   -> still admitted (settled-first)
      13L -> "too short",         // tick0: gate-dropped
      21L -> text("tc"),          // tick0: admitted
      41L -> text("ta", "rr"),    // tick1: near-dup of settled 11 -> rejected
      45L -> text("tc"),          // tick1: identical to 21 -> hash-dropped
      51L -> text("td"),          // tick1: admitted
      71L -> text("tb", "vv"),    // tick2: near-dup of settled 12/15 -> rejected
      89L -> text("te", "ww"),    // tick2: near-dup of EVAL 30 -> decon-dropped
      30L -> text("te"),          // eval split (id % 10 == 0)
      60L -> text("tf"))          // eval split
    val dir = java.nio.file.Files.createTempDirectory("graft_relstream").toString
    docs.map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft_relstream_root").toString
    val all = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    ReleaseStream.buildEvalIndex(all.filter(col("doc_id") % 10 === 0), root)
    val arriving = all.filter(col("doc_id") % 10 =!= 0)
    Seq((0L, 1L, 29L), (1L, 30L, 59L), (2L, 60L, 89L)).foreach { case (tick, lo, hi) =>
      ReleaseStream.releaseTickXO(
        arriving.filter(col("doc_id") >= lo && col("doc_id") <= hi), tick, root)
    }
    def manifest() = ReleaseStream.currentManifest(spark, root)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val m1 = manifest()
    // released = exactly the five admitted docs, nothing else
    val releasedIds = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$root/shards").select(col("doc_id")).as[Long].collect().toSet
    assert(releasedIds == Set(11L, 12L, 15L, 21L, 51L),
      s"released set wrong: $releasedIds")
    // manifest totals match the released docs' bytes
    val wantBytes = docs.toMap.view.filterKeys(releasedIds).values.map(_.length.toLong).sum
    assert(m1.map(_._3).sum == wantBytes)
    assert(m1.map(_._2).sum == 5L)
    // replay tick 1 out of band: every store is tick-partitioned XO, so
    // the manifest must not change
    ReleaseStream.releaseTickXO(
      arriving.filter(col("doc_id") >= 30L && col("doc_id") <= 59L), 1L, root)
    assert(manifest().toSeq == m1.toSeq, "tick replay changed the manifest")
  }

  test("q183 release recovery: replay after a mid-tick crash recomputes every store from pre-tick state") {
    import graft.streaming.ReleaseStream
    import spark.implicits._
    // the q183 fixture verbatim — tick 1 carries all three interesting
    // fates (41 settled-near-dup-rejected, 45 hash-dropped, 51 admitted),
    // so a lost tick-1 admission is observable in every store
    def text(tag: String, last: String = "zz"): String = {
      val words = (for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$tag$a$b").take(53)
      ("the" +: words :+ s"the $tag$last").mkString(" ")
    }
    val docs = Seq(
      11L -> text("ta"), 12L -> text("tb"), 15L -> text("tb", "qq"),
      13L -> "too short", 21L -> text("tc"),
      41L -> text("ta", "rr"), 45L -> text("tc"), 51L -> text("td"),
      30L -> text("te"), 60L -> text("tf"))
    val dir = java.nio.file.Files.createTempDirectory("graft_relrec").toString
    docs.map { case (id, t) => (id, t, "en", "s0") }
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val root = java.nio.file.Files.createTempDirectory("graft_relrec_root").toString
    val all = Tables.documents(spark, dir).select(col("doc_id"), col("lang"), col("text"))
    ReleaseStream.buildEvalIndex(all.filter(col("doc_id") % 10 === 0), root)
    val arriving = all.filter(col("doc_id") % 10 =!= 0)
    val tick1 = arriving.filter(col("doc_id") >= 30L && col("doc_id") <= 59L)
    ReleaseStream.releaseTickXO(
      arriving.filter(col("doc_id") <= 29L), 0L, root)
    ReleaseStream.releaseTickXO(tick1, 1L, root)
    // reference state: every store's cumulative rows after a CLEAN tick 1
    def rows(path: String, json: Boolean = false): Set[Seq[Any]] = {
      val df = if (json)
        spark.read.schema("doc_id BIGINT, lang STRING, text STRING").json(path)
      else spark.read.parquet(path)
      df.collect().map(_.toSeq).toSet
    }
    def snapshot(): Map[String, Set[Seq[Any]]] = Map(
      "hashes" -> rows(s"$root/hashes"),
      "shingle_index" -> rows(s"$root/shingle_index"),
      "shards" -> rows(s"$root/shards", json = true),
      "totals" -> rows(s"$root/totals"))
    val clean = snapshot()
    val tick1Bytes = spark.read.parquet(s"$root/totals")
      .filter(col("ingest_batch") === 1L)
      .agg(sum(col("batch_bytes"))).head().getLong(0)
    assert(tick1Bytes > 0L, "fixture must export bytes in tick 1")
    def delete(sub: String): Unit = {
      val p = new java.io.File(s"$root/$sub")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      assert(p.exists(), s"crash-window fixture expects $sub to exist")
      rm(p)
    }
    // crash window A: tick 1 died after landing only its hash partition —
    // the window where a self-shadowing index read would make the replay
    // admit NOTHING and overwrite totals with batch_bytes=0
    delete("shingle_index/ingest_batch=1")
    delete("shards/ingest_batch=1")
    delete("totals/ingest_batch=1")
    ReleaseStream.releaseTickXO(tick1, 1L, root)
    assert(snapshot() == clean, "replay after hash-only crash diverged")
    // crash window B: died after hashes + shingle index, before export
    delete("shards/ingest_batch=1")
    delete("totals/ingest_batch=1")
    ReleaseStream.releaseTickXO(tick1, 1L, root)
    assert(snapshot() == clean, "replay after pre-export crash diverged")
    // replay after full success keeps the totals continuation intact —
    // the ADVICE failure mode was batch_bytes silently rewritten to 0
    ReleaseStream.releaseTickXO(tick1, 1L, root)
    assert(snapshot() == clean, "replay after success diverged")
    assert(spark.read.parquet(s"$root/totals")
      .filter(col("ingest_batch") === 1L)
      .agg(sum(col("batch_bytes"))).head().getLong(0) == tick1Bytes,
      "tick-1 totals lost after replay")
  }

  test("q182 streaming erasure: bucket-pruned rewrite, replay no-op, null user retained") {
    import graft.streaming.ErasureStream
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_erasure_stream").toString
    val store = s"$root/store"
    val tombs = s"$root/tombstones"
    ErasureStream.buildStore(spark, TestSpark.Sf0001, store)
    def storeFiles(): Map[String, Set[String]] =
      new java.io.File(store).listFiles().filter(_.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().map(f => s"${f.getName}:${f.length}").toSet).toMap
    val allUsers = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id")).as[Long].collect()
    // single-victim tick: ONLY that user's bucket partition may change
    val victim = allUsers.distinct.min
    val victimBucket = s"bucket=${victim % 16}"
    val before = storeFiles()
    ErasureStream.erasureTickXO(spark, store, tombs, 0L, col("user_id") === victim)
    val after = storeFiles()
    before.keySet.filter(_ != victimBucket).foreach { b =>
      assert(after(b) == before(b), s"untouched partition $b was rewritten")
    }
    // the victim bucket was rewritten — or deleted outright if the victim
    // was its only user (the dynamic-overwrite-can't-empty-a-partition
    // case the engine handles explicitly)
    assert(after.getOrElse(victimBucket, Set.empty[String]) != before(victimBucket),
      "victim bucket unchanged")
    // replay the same tick: audit and store both unchanged (exactly-once)
    val audit1 = ErasureStream.erasureAudit(spark, store, tombs)
      .collect().map(_.toSeq).toSet
    ErasureStream.erasureTickXO(spark, store, tombs, 0L, col("user_id") === victim)
    val audit2 = ErasureStream.erasureAudit(spark, store, tombs)
      .collect().map(_.toSeq).toSet
    assert(audit1 == audit2, "tick replay changed the audit")
    // second tick on another user: cumulative audit covers both, store
    // keeps every non-victim row
    val victim2 = allUsers.distinct.sorted.apply(1)
    ErasureStream.erasureTickXO(spark, store, tombs, 1L, col("user_id") === victim2)
    val audit = ErasureStream.erasureAudit(spark, store, tombs)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(audit.keySet == Set(victim, victim2))
    val expect = allUsers.groupBy(identity).view.mapValues(_.length.toLong).toMap
    audit.values.foreach { case (u, n, rem, purged) =>
      assert(n == expect(u) && rem == 0L && purged, s"user $u: ($n, $rem, $purged)")
    }
    val kept = spark.read.parquet(store).select(col("user_id")).as[Long].collect()
    val keptWant = allUsers.filter(u => u != victim && u != victim2)
    assert(kept.sorted.toSeq == keptWant.sorted.toSeq,
      "a non-victim row was lost or duplicated")
    // null-safety: a null-keyed row must survive any request predicate
    val nroot = java.nio.file.Files.createTempDirectory("graft_erasure_null").toString
    val withNull = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), Some(13L), "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), None, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    withNull.write.mode("overwrite").parquet(s"$nroot/events.parquet")
    ErasureStream.buildStore(spark, nroot, s"$nroot/store")
    ErasureStream.erasureTickXO(spark, s"$nroot/store", s"$nroot/tombs", 0L,
      col("user_id") % 13 === 0)
    val left = spark.read.parquet(s"$nroot/store")
      .select(col("event_id")).as[Long].collect().toSet
    assert(left == Set(2L), s"null-keyed row must be retained, user 13 erased: $left")
  }

  test("q182 erasure recovery: tombstones survive replay over a partially-mutated store") {
    import graft.streaming.ErasureStream
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_erasure_rec").toString
    val store = s"$root/store"
    val tombs = s"$root/tombstones"
    ErasureStream.buildStore(spark, TestSpark.Sf0001, store)
    // two victims in DIFFERENT buckets, so a partial store rewrite can
    // leave one victim's rows behind while the other's are already gone
    val users = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id")).as[Long].collect()
    val counts = users.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val distinctUsers = users.distinct.sorted
    val uA = distinctUsers.head
    val uB = distinctUsers.find(_ % 16 != uA % 16).get
    // stash uB's pre-tick store rows to restore after the "crash"
    spark.read.parquet(store).filter(col("user_id") === uB)
      .write.mode("overwrite").parquet(s"$root/stash_b")
    ErasureStream.erasureTickXO(spark, store, tombs, 0L,
      col("user_id").isin(uA, uB))
    def audit(): Map[Long, (Long, Long, Boolean)] =
      ErasureStream.erasureAudit(spark, store, tombs)
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val cleanAudit = audit()
    assert(cleanAudit == Map(
      uA -> ((counts(uA), 0L, true)), uB -> ((counts(uB), 0L, true))),
      s"clean tick audit wrong: $cleanAudit")
    // CRASH WINDOW (the ADVICE scenario): the tick died mid store-rewrite
    // — uA's bucket already erased, uB's not yet touched. Restore uB's
    // rows; a replay that recomputed tombstones from this mutated store
    // would see only uB as victim and overwrite the tick partition
    // WITHOUT uA — silent deletion without a tombstone.
    spark.read.parquet(s"$root/stash_b")
      .write.mode("append").partitionBy("bucket").parquet(store)
    ErasureStream.erasureTickXO(spark, store, tombs, 0L,
      col("user_id").isin(uA, uB))
    assert(audit() == cleanAudit,
      s"replay over partially-mutated store changed the audit: ${audit()}")
    assert(spark.read.parquet(store)
      .filter(col("user_id").isin(uA, uB)).count() == 0L,
      "replay left victim rows in the store")
    // CRASH WINDOW 2: the first attempt died mid TOMBSTONE write (only
    // uA's row landed; store untouched). The later full run must restore
    // uB's count from the live store — per-user max over the union.
    val root2 = java.nio.file.Files.createTempDirectory("graft_erasure_rec2").toString
    ErasureStream.buildStore(spark, TestSpark.Sf0001, s"$root2/store")
    Seq((uA, counts(uA), 0L)).toDF("user_id", "n_rows_erased", "tick")
      .write.mode("append").partitionBy("tick").parquet(s"$root2/tombstones")
    ErasureStream.erasureTickXO(spark, s"$root2/store", s"$root2/tombstones",
      0L, col("user_id").isin(uA, uB))
    val a2 = ErasureStream.erasureAudit(spark, s"$root2/store", s"$root2/tombstones")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(a2 == Map(
      uA -> ((counts(uA), 0L, true)), uB -> ((counts(uB), 0L, true))),
      s"partial-tombstone recovery audit wrong: $a2")
  }
}