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

  test("mapGroupsWithState per-user totals match the batch aggregation") {
    runToCompletion(
      EventWindows.streamingUserTotals(spark, TestSpark.Sf0001)
        .writeStream.format("memory").queryName("stream_user_totals").outputMode("update"))
    val streamed = spark.sql(
      "SELECT user_id, n_events, total_value FROM stream_user_totals")
    val batch = Tables.events(spark, TestSpark.Sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events_b"), sum(col("value")).as("total_b"))
    // double accumulation order differs between the stateful stream and the
    // batch hash aggregate, so totals compare with an fp tolerance
    val joined = streamed.join(batch, "user_id")
    assert(joined.count() == batch.count(), "every user must appear exactly once")
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
    // all events arrive in one micro-batch, so everything but each user's
    // trailing (still-open) session must emit with identical boundaries
    val batchW = Window.partitionBy(col("user_id")).orderBy(col("session_start_ms").desc)
    val expected = batch
      .withColumn("rn", row_number().over(batchW))
      .filter(col("rn") > 1) // drop the open tail session per user
      .select(col("user_id"), col("session_start_ms"), col("n_events"))
    val got = streamed.select(col("user_id"), col("session_start_ms"), col("n_events"))
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
    // values: fp-tolerant against the batch twin's rounded sums
    val joined = streamed.join(batch, Seq("user_id", "session_start_ms"))
    assert(joined.filter(
      abs(streamed("sum_value") - batch("sum_value")) > 0.011).count() == 0)
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
}
