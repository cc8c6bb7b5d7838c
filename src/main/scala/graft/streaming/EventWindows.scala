package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Time-window operators over the events fixture (SURVEY §2.10 [EXT]).
  * The reference has no streaming at all; the capability contract is
  * tumbling/sliding/session windows + dedup-within-watermark, each with a
  * batch twin (oracle-checkable by DuckDB time-bucket SQL) and a Structured
  * Streaming builder (exercised in the spec with a memory sink).
  *
  * Window starts are emitted as epoch milliseconds (unix_millis) rather
  * than raw timestamps so the oracle comparison never depends on parquet
  * timestamp-zone encoding.
  *
  * Every stateful operator bounds its state: the built-in windows by
  * watermark, the custom GroupState operators by event-time timeouts
  * (idle keys are EVICTED once the watermark passes their TTL — the only
  * form that survives an unbounded keyspace).
  */
object EventWindows {

  /** Tumbling 1-hour windows: count + value sum per (window, event_type). */
  def tumblingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding windows: 1-hour length, 30-minute hop — each event lands in
    * exactly 2 windows. */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("w.start")).as("window_start_ms"), col("event_type"), col("cnt"))

  /** Session windows per user: events merge while the gap to the previous
    * event is < gap (Spark session_window semantics: session end = last
    * event + gap). */
  def sessionCounts(spark: SparkSession, dir: String, gap: String = "1 hour"): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
        col("n_events"), col("sum_value"))

  /** q101 — EVENT-SEQUENCE ASSEMBLY: per-user ordered action sequences,
    * the behavioral-model twin of q84's token packing. Each user's events
    * sort by (ts, event_id) — a total order, event_id is unique — and emit
    * as a compact manifest: count, first/last action, and an
    * ORDER-SENSITIVE sequence fingerprint (md5 of the comma-joined type
    * sequence) a sequence-model loader dedups and shards by.
    *
    * The sort is IN-ROW over the collected array (one hash shuffle on
    * user_id, never a global sort); per-user state is bounded by that
    * user's activity — the batch analog of the streaming sessionizer's
    * per-key state. A pathological single-user firehose would need the
    * salt-and-merge treatment (q47); the fixture's per-user volumes are
    * the normal case this verb is shaped for.
    */
  def eventSequences(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))).as("seq"))
      .select(col("user_id"), col("n_events"),
        element_at(col("seq"), 1).getField("event_type").as("first_type"),
        element_at(col("seq"), -1).getField("event_type").as("last_type"),
        md5(concat_ws(",",
          transform(col("seq"), x => x.getField("event_type")))).as("seq_md5"))

  /** Dedup-within-watermark, batch twin: the stream form is
    * withWatermark + dropDuplicates(event_id); in batch (union-doubled to
    * plant duplicates) that is exact distinct-by-key. */
  def dedupByEventId(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("event_type"))
    ev.unionByName(ev)
      .dropDuplicates(Seq("event_id", "event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique"))
  }

  /** q105 — EVENT CONVERSION FUNNEL: how many users progress through an
    * ordered stage sequence (view → click → purchase), where each stage
    * counts only if its first qualifying event is STRICTLY AFTER the
    * user's previous-stage time — the standard product-analytics funnel,
    * and the engagement-quality signal an interaction-data pipeline uses
    * to pick training users. Computed as a fold of per-user conditional
    * aggregations: stage 0 is min(ts) over its event type; stage i+1
    * joins events of its type against the stage-i relation (both sides
    * keyed on user_id, so AQE co-partitions the chain) and takes the
    * min ts past the previous stage's. Each stage relation is ≤|users|
    * rows; the event scans prune to one event_type each (pushdown).
    * Output: one row per stage with the surviving user count.
    */
  def conversionFunnel(spark: SparkSession, dir: String,
                       stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val perStage = stages.tail.foldLeft(List(
      e.filter(col("event_type") === stages.head)
        .groupBy(col("user_id")).agg(min(col("ts")).as("stage_ts")))) {
      case (acc, st) =>
        val cur = e.filter(col("event_type") === st)
          .join(acc.head.select(col("user_id"), col("stage_ts").as("prev_ts")), "user_id")
          .filter(col("ts") > col("prev_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("stage_ts"))
        cur :: acc
    }.reverse
    stages.zip(perStage).zipWithIndex.map { case ((st, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i.toLong).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** A39 [EXT] — RETENTION COHORT MATRIX: the week-over-week retention
    * table every activity log gets asked for — users grouped by the week
    * of their FIRST event (the cohort), each cohort's fraction still
    * active k weeks later. Weeks anchor at the corpus' own first event
    * DATE (data-derived, deterministic, regeneration-proof — a calendar
    * anchor would silently shift if the fixture's date range moved);
    * activity is per-(user, week) distinct so event volume inside a week
    * cannot inflate retention. Output per (cohort_week, weeks_since):
    * cohort size, active users, 6dp retention.
    *
    * Scale: one scan → per-(user, week) distinct (map-side combinable);
    * cohorts are a min-agg over that user-week relation; the matrix join
    * and rollup run on \|users × weeks\| rows, never raw events. The
    * anchor is ONE metadata-cheap min, broadcast as a literal.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val e = Tables.events(spark, dir).select(col("user_id"), to_date(col("ts")).as("d"))
    // two passes over raw events, not three: the anchor is one map-side-
    // combined min (no shuffle payload), and the user-week distinct spills
    // ONCE (the q88 leaf discipline) so the cohort agg and the matrix join
    // read the spill instead of each re-running the corpus-width distinct.
    // collected as a STRING, not DateType — the java.sql.Date decode's
    // reflective static_invoke path flaked EXPRESSION_DECODING_FAILED
    // once in a long sweep JVM (see rfmSegments' anchor note)
    val anchor = java.sql.Date.valueOf(
      e.agg(min(col("d")).cast("string")).head().getString(0))
    val uw = graft.sources.Sources.spillScratch(
      e.select(col("user_id"),
          floor(datediff(col("d"), lit(anchor)) / 7).cast("long").as("week"))
        .distinct(),
      "retention_uw")
    val cohorts = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = cohorts.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_users"))
    uw.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(count(lit(1)).as("active_users"))
      .join(sizes, "cohort_week")
      .select(col("cohort_week"), col("weeks_since"), col("cohort_users"),
        col("active_users"),
        round((col("active_users").cast("double") / col("cohort_users")).cast(dec), 6)
          .cast("double").as("retention"))
  }

  /** §2.10 [EXT] — BATCH GAP SESSIONIZATION AUDIT: the batch twin of the
    * streaming session window (q32). A session is a maximal run of one
    * user's events with no gap exceeding `gapMinutes`, computed with
    * lag + cumulative-sum window functions instead of streaming state
    * (reference anchor: the session grain its event pipeline implies,
    * `/root/reference/src/preprocessing_pipeline.py` event handling).
    * Output is the session-size distribution: per events-in-session,
    * session and user counts plus duration stats in MICROSECONDS —
    * integers are engine-exact; the mean is the only float, rounded
    * through DECIMAL(38,18) at 6dp (the repo rounding discipline).
    *
    * Tie note: tied timestamps have gap 0 under ANY consistent tie
    * order, so session MEMBERSHIP — and therefore every aggregated
    * output row — is deterministic even though the per-row session
    * NUMBER among tied rows is not.
    *
    * Scale: both windows partition by user_id — one hash shuffle of
    * (user, ts) pairs, never a global sort; runs sort inside their
    * partition. The rollup is map-side combinable and the output is
    * bounded by the distinct session sizes, not the event count. A
    * skewed power user bounds at their own event count; the gap rule
    * is per-user so salting is not applicable (correct form at 100 TB
    * is range-partition within user via the same window).
    */
  def sessionizationAudit(spark: SparkSession, dir: String,
                          gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val sess = e
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum(col("new_sess")).over(run))
    sess.groupBy(col("user_id"), col("sess_no"))
      .agg(count(lit(1)).as("events_in_session"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
      .groupBy(col("events_in_session"))
      .agg(count(lit(1)).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        round(avg(col("dur_us")).cast(dec), 6).cast("double")
          .as("avg_duration_us"),
        max(col("dur_us")).as("max_duration_us"))
  }

  /** q113 — SEMI-STRUCTURED PROPS ROLLUP: the events table carries a JSON
    * `props` column (the schemaless payload every event log has); parse it
    * under a DECLARED schema with `from_json` — a codegen-friendly per-row
    * expression, never a driver-side parse — and roll up the extracted
    * field per event type. Malformed JSON or a missing key yields null
    * (from_json's contract) and falls out of the aggregates; the declared
    * schema means column pruning still reaches the parquet scan (only
    * event_type + props read).
    */
  def eventPropsRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 6).as("avg_k"),
        max(col("k")).as("max_k"))

  // --- Structured Streaming twins (spec-exercised with memory sinks) ---

  /** File-driven stream over the events fixture. The fixture is a single
    * parquet FILE; the file stream source needs a directory basePath, so
    * stream the parent dir glob-filtered to that file, and normalize the
    * nanosecond ts like the batch loader does. */
  private[streaming] def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = Tables.table(spark, dir, "events").schema
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    batchSchema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", Tables.nanosToTimestamp(col("ts")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Streaming tumbling aggregation with a 1-hour watermark. The plan is
    * identical to tumblingCounts modulo the watermark node, which is the
    * point: batch and stream share operator semantics. */
  def streamingTumblingCounts(spark: SparkSession, dir: String): DataFrame =
    eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("cnt"))

  /** Streaming sliding windows: 1-hour length, 30-minute hop, watermarked. */
  def streamingSlidingCounts(spark: SparkSession, dir: String): DataFrame =
    eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("w.start")).as("window_start_ms"), col("event_type"), col("cnt"))

  /** Streaming session windows: gap-merged per-user sessions with a
    * watermark bounding state; closed sessions (end < watermark) emit in
    * append mode. */
  def streamingSessionCounts(spark: SparkSession, dir: String, gap: String = "1 hour"): DataFrame =
    eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
        col("n_events"), col("sum_value"))

  /** Custom-state streaming aggregation (mapGroupsWithState): per-user
    * running event count and value total held in explicit
    * `GroupState[UserTotals]`. This is the escape hatch for stateful
    * semantics the built-in windows can't express; state is one fixed-size
    * record per user, partitioned by the group key and checkpointable.
    */
  case class UserTotals(n: Long, total: Double)

  /** Core of [[streamingUserTotals]] over any streaming frame with
    * (user_id, ts: timestamp, value): running totals per user with
    * EVENT-TIME EVICTION. A key idle past ttlMs — by watermark, not wall
    * clock — emits its final totals once and is removed, so state stays
    * bounded on an unbounded keyspace; a key seen again afterwards
    * re-initializes from zero (spec-pinned). The watermark guarantees the
    * timeout timestamp (last event + ttl) is always ahead of the clock
    * that fires it.
    */
  def userTotalsWithEviction(ev: DataFrame, watermarkDelay: String = "1 hour",
                             ttlMs: Long = 7200000L): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    // the watermarked `ts` attribute itself must reach the stateful
    // operator's input (projecting it to a long strips the watermark tag
    // and the analyzer rejects the event-time timeout); millis conversion
    // happens inside the lambda
    ev.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotals, (Long, Long, Double)](
        GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            // watermark passed last event + ttl: emit final totals, evict
            val s = state.get
            state.remove()
            (uid, s.n, s.total)
          } else {
            var s = state.getOption.getOrElse(UserTotals(0L, 0.0))
            var maxTs = Long.MinValue
            rows.foreach { case (_, t, v) =>
              s = UserTotals(s.n + 1, s.total + v)
              maxTs = math.max(maxTs, t.getTime)
            }
            state.update(s)
            state.setTimeoutTimestamp(maxTs + ttlMs)
            (uid, s.n, s.total)
          }
      }
      .toDF("user_id", "n_events", "total_value")
  }

  def streamingUserTotals(spark: SparkSession, dir: String): DataFrame =
    userTotalsWithEviction(eventStream(spark, dir))

  /** Per-user funnel state: events not yet finalized by the watermark
    * (ts_ms, stage_idx), and each stage's first-hit time (MinValue =
    * unreached). One fixed-size record + a watermark-bounded buffer per
    * user. */
  case class FunnelState(buffer: List[(Long, Int)], reached: List[Long])
  /** A stage completion emitted by the streaming funnel (time in µs). */
  case class FunnelHit(user_id: Long, stage_idx: Int, ts_us: Long)

  /** Streaming twin of [[conversionFunnel]] (q105): flatMapGroupsWithState
    * where correctness against the batch form is guaranteed by FINALIZING
    * IN WATERMARK ORDER. The batch funnel's "first qualifying event
    * strictly after the previous stage's first hit" is order-sensitive —
    * a late-arriving early view can re-qualify an already-seen click — so
    * events are buffered until the watermark passes them, then replayed
    * through the monotone stage machine in (ts, stage) order, where the
    * rule "stage i fires on the first event with t > t(i-1)" is exactly
    * the batch fold. State per user: the fixed-size reached vector + a
    * buffer bounded by watermark delay × arrival rate; an event-time
    * timeout at the earliest buffered event guarantees the buffer drains
    * even if the user never appears again. Emits one FunnelHit per
    * (user, stage) ever; completed users keep only the reached vector.
    */
  def conversionFunnelStream(ev: DataFrame,
                             stages: Seq[String] = Seq("view", "click", "purchase"),
                             watermarkDelay: String = "1 hour"): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val nStages = stages.size
    ev.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          val st = state.getOption.getOrElse(
            FunnelState(Nil, List.fill(nStages)(Long.MinValue)))
          // microseconds, not getTime's ms: the batch funnel compares full
          // timestamp precision and same-ms distinct events must stay
          // ordered (Spark timestamps are µs; getNanos carries them)
          def micros(tt: java.sql.Timestamp): Long =
            math.floorDiv(tt.getTime, 1000L) * 1000000L + tt.getNanos / 1000L
          val incoming = rows
            .flatMap { case (_, tt, et) => stageIdx.get(et).map(i => (micros(tt), i)) }
            .toList
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ripe, hold) = (st.buffer ++ incoming).partition(_._1 <= wmUs)
          val reached = st.reached.toArray
          val out = scala.collection.mutable.Buffer.empty[FunnelHit]
          // (ts, stage) order makes a same-instant view-then-click resolve
          // the same way the batch's strict > does: the click is NOT after
          // the view's time, so it waits for a later one
          ripe.sorted.foreach { case (t, i) =>
            if (reached(i) == Long.MinValue &&
                (i == 0 || (reached(i - 1) != Long.MinValue && t > reached(i - 1)))) {
              reached(i) = t
              out += FunnelHit(uid, i, t)
            }
          }
          state.update(FunnelState(hold, reached.toList))
          // drain guarantee: fire when the watermark passes the earliest
          // held event; ceil µs→ms so the timeout stays strictly above the
          // current watermark (API requirement), at most 1 ms late
          if (hold.nonEmpty)
            state.setTimeoutTimestamp(math.floorDiv(hold.map(_._1).min, 1000L) + 1L)
          out.iterator
      }
      .toDF()
  }

  /** Open-session state for the custom sessionizer. */
  case class OpenSession(start_ms: Long, last_ms: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, session_start_ms: Long, n_events: Long, sum_value: Double)

  /** Core of [[streamingCustomSessionize]]: flatMapGroupsWithState — the
    * 0..n-rows-per-key stateful escape hatch (mapGroupsWithState emits
    * exactly one). Events sessionize with the same gap semantics as
    * `session_window` (merge while gap < threshold): sessions CLOSED by a
    * later in-batch event emit immediately; the trailing open session per
    * user stays in state with an event-time timeout at last event + gap —
    * once the watermark passes that point no event can ever bridge the gap
    * (later-than-watermark arrivals are dropped), so the session closes,
    * EMITS, and its state is evicted. State is one fixed-size record per
    * ACTIVE key, and idle keys leave; the per-group in-batch sort is
    * bounded by a micro-batch's per-key volume, not history.
    */
  def customSessionizeWithEviction(ev: DataFrame, gapMs: Long = 3600000L,
                                   watermarkDelay: String = "1 hour"): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    // keep the watermarked `ts` attribute itself (see userTotalsWithEviction)
    ev.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            // the gap can no longer be bridged: close, emit, evict
            val out = state.getOption
              .map(s => ClosedSession(uid, s.start_ms, s.n, s.total))
            state.remove()
            out.iterator
          } else {
            val closed = scala.collection.mutable.Buffer.empty[ClosedSession]
            var open = state.getOption
            // late cross-batch events wholly BEFORE the open session's
            // interval accumulate in an "earlier pending session": within
            // one batch they merge with EACH OTHER under the ordinary gap
            // rule (the rows are sorted, so batch session_window would
            // merge them too), and the pending session emits when the
            // chain breaks or the batch ends. Only a straggler arriving in
            // a LATER batch that would have merged with an already-emitted
            // pending session remains best-effort — the documented cost of
            // bounded state.
            var pending: Option[OpenSession] = None
            def flushPending(): Unit = {
              pending.foreach(p => closed += ClosedSession(uid, p.start_ms, p.n, p.total))
              pending = None
            }
            rows.toSeq.sortBy(_._2.getTime).foreach { case (_, tt, v) =>
              val t = tt.getTime
              open match {
                case Some(s) if t - s.last_ms < gapMs && t > s.start_ms - gapMs =>
                  // merge only when the event's [t, t+gap) interval
                  // overlaps the session's [start, last+gap) — the batch
                  // session_window merge rule. A late cross-batch event
                  // inside the interval EXTENDS the bounds, never rewinds
                  // them past what the overlap allows (shrinking last_ms
                  // would pull the event-time timeout earlier and
                  // prematurely evict a live session)
                  var merged = s.copy(start_ms = math.min(s.start_ms, t),
                    last_ms = math.max(s.last_ms, t),
                    n = s.n + 1, total = s.total + v)
                  // a rewound start can bring the pending earlier session
                  // within gap reach: batch session_window would then
                  // merge the whole chain, so fold pending in instead of
                  // letting it flush as a spuriously separate session
                  pending match {
                    case Some(p) if merged.start_ms - p.last_ms < gapMs =>
                      merged = merged.copy(start_ms = math.min(p.start_ms, merged.start_ms),
                        n = merged.n + p.n, total = merged.total + p.total)
                      pending = None
                    case _ => ()
                  }
                  open = Some(merged)
                case Some(s) if t <= s.start_ms - gapMs =>
                  // wholly before the open session: fold into the pending
                  // earlier session while within its gap (rows ascend, so
                  // only the forward distance needs checking), else emit
                  // the pending chain and start a new one. Never merged
                  // into the open session — that would rewind start_ms and
                  // diverge from session_window
                  pending match {
                    case Some(p) if t - p.last_ms < gapMs =>
                      pending = Some(p.copy(last_ms = t, n = p.n + 1, total = p.total + v))
                    case _ =>
                      flushPending()
                      pending = Some(OpenSession(t, t, 1L, v))
                  }
                case Some(s) =>
                  closed += ClosedSession(uid, s.start_ms, s.n, s.total)
                  open = Some(OpenSession(t, t, 1L, v))
                case None =>
                  open = Some(OpenSession(t, t, 1L, v))
              }
            }
            flushPending()
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.iterator
          }
      }
      .toDF()
  }

  def streamingCustomSessionize(spark: SparkSession, dir: String,
                                gapMs: Long = 3600000L): DataFrame =
    customSessionizeWithEviction(eventStream(spark, dir), gapMs)

  /** Stream-stream interval join — the streaming twin of
    * Relational.intervalJoinCounts' range join: each `click` matches the
    * same user's `view` events in the preceding windowMs. Structured
    * Streaming's symmetric hash join keys on the equi-part (user_id) and
    * uses the event-time range constraint + both watermarks to EVICT
    * buffered rows that can no longer match — the state-bounding
    * requirement without which a stream-stream join grows forever. Emits
    * the matched pairs in append mode; the spec checks them against the
    * batch inequality join.
    */
  def streamingIntervalJoin(spark: SparkSession, dir: String,
                            windowMs: Long = 1800000L): DataFrame = {
    // two independent source instances: each side of a stream-stream join
    // is its own stream
    val clicks = eventStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val views = eventStream(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    clicks.join(views,
      col("c_user") === col("v_user")
        && col("view_ts") >= col("click_ts") - expr(s"INTERVAL $windowMs milliseconds")
        && col("view_ts") < col("click_ts"))
      .select(col("c_user").as("user_id"),
        unix_millis(col("click_ts")).as("click_ms"),
        unix_millis(col("view_ts")).as("view_ms"))
  }

  /** Streaming dedup within a watermark: state holds event_ids only as
    * long as the watermark allows — bounded state at any scale. */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame =
    eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicates(Seq("event_id"))
      .select(col("event_id"), col("event_type"), col("value"))
}
