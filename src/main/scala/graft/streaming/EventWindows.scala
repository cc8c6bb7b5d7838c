package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Time-window operators over the events fixture (SURVEY §2.10 [EXT]).
  * The reference has no streaming at all; the capability contract is
  * tumbling/sliding/session windows + dedup-within-watermark, each with a
  * batch twin (oracle-checkable by DuckDB time-bucket SQL) and a Structured
  * Streaming builder (exercised in the spec with a memory sink).
  *
  * Window starts are emitted as epoch milliseconds (unix_millis) rather
  * than raw timestamps so the oracle comparison never depends on parquet
  * timestamp-zone encoding.
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

  // --- Structured Streaming twins (spec-exercised with memory sinks) ---

  /** Streaming tumbling aggregation with a 1-hour watermark over a
    * file-driven stream of the same parquet. The plan is identical to
    * tumblingCounts modulo the watermark node, which is the point: batch
    * and stream share operator semantics.
    */
  def streamingTumblingCounts(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = Tables.table(spark, dir, "events").schema
    // the fixture is a single parquet FILE; the file stream source needs a
    // directory basePath, so stream the parent dir filtered to that file
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val ev =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", Tables.nanosToTimestamp(col("ts")))
      else raw
    ev.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("cnt"))
  }

  /** Streaming sliding windows: 1-hour length, 30-minute hop, watermarked.
    * Plan is slidingCounts modulo the watermark node. */
  def streamingSlidingCounts(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = Tables.table(spark, dir, "events").schema
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val ev =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", Tables.nanosToTimestamp(col("ts")))
      else raw
    ev.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("w.start")).as("window_start_ms"), col("event_type"), col("cnt"))
  }

  /** Streaming session windows: gap-merged per-user sessions with a
    * watermark bounding state; closed sessions (end < watermark) emit in
    * append mode. Plan is sessionCounts modulo the watermark node. */
  def streamingSessionCounts(spark: SparkSession, dir: String, gap: String = "1 hour"): DataFrame = {
    val batchSchema = Tables.table(spark, dir, "events").schema
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val ev =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", Tables.nanosToTimestamp(col("ts")))
      else raw
    ev.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
        col("n_events"), col("sum_value"))
  }

  /** Custom-state streaming aggregation (mapGroupsWithState): per-user
    * running event count and value total held in explicit
    * `GroupState[UserTotals]`. This is the escape hatch for stateful
    * semantics the built-in windows can't express; state is one fixed-size
    * record per user — bounded, partitioned by the group key, and
    * checkpointable, which is what keeps it viable on an unbounded stream.
    */
  case class UserTotals(n: Long, total: Double)

  def streamingUserTotals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val batchSchema = Tables.table(spark, dir, "events").schema
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val ev =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", Tables.nanosToTimestamp(col("ts")))
      else raw
    ev.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotals, (Long, Long, Double)](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          var s = state.getOption.getOrElse(UserTotals(0L, 0.0))
          rows.foreach { case (_, v) => s = UserTotals(s.n + 1, s.total + v) }
          state.update(s)
          (uid, s.n, s.total)
      }
      .toDF("user_id", "n_events", "total_value")
  }

  /** Open-session state for the custom sessionizer. */
  case class OpenSession(start_ms: Long, last_ms: Long, n: Long, total: Double)
  case class ClosedSession(user_id: Long, session_start_ms: Long, n_events: Long, sum_value: Double)

  /** Custom sessionizer via flatMapGroupsWithState — the 0..n-rows-per-key
    * stateful escape hatch (mapGroupsWithState emits exactly one). Events
    * are sessionized with the same gap semantics as `session_window`
    * (merge while gap < threshold): sessions CLOSED by a later in-batch
    * event emit immediately; the trailing open session per user stays in
    * state (one fixed-size record per key) awaiting future batches. The
    * per-group in-batch sort is bounded by a micro-batch's per-key volume,
    * not history — state never grows with time.
    */
  def streamingCustomSessionize(spark: SparkSession, dir: String,
                                gapMs: Long = 3600000L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val batchSchema = Tables.table(spark, dir, "events").schema
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val ev =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", Tables.nanosToTimestamp(col("ts")))
      else raw
    ev.select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("value"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val closed = scala.collection.mutable.Buffer.empty[ClosedSession]
          var open = state.getOption
          rows.toSeq.sortBy(_._2).foreach { case (_, t, v) =>
            open match {
              case Some(s) if t - s.last_ms < gapMs =>
                open = Some(s.copy(last_ms = t, n = s.n + 1, total = s.total + v))
              case Some(s) =>
                closed += ClosedSession(uid, s.start_ms, s.n, s.total)
                open = Some(OpenSession(t, t, 1L, v))
              case None =>
                open = Some(OpenSession(t, t, 1L, v))
            }
          }
          open.foreach(state.update)
          closed.iterator
      }
      .toDF()
  }

  /** Streaming dedup within a watermark: state holds event_ids only as
    * long as the watermark allows — bounded state at any scale. */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame = {
    val batchSchema = Tables.table(spark, dir, "events").schema
    // the fixture is a single parquet FILE; the file stream source needs a
    // directory basePath, so stream the parent dir filtered to that file
    val raw = spark.readStream.schema(batchSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val ev =
      if (batchSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", Tables.nanosToTimestamp(col("ts")))
      else raw
    ev.withWatermark("ts", "1 hour")
      .dropDuplicates(Seq("event_id"))
      .select(col("event_id"), col("event_type"), col("value"))
  }
}
