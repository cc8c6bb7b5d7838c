package graft.tools

import graft.GraftSession
import graft.streaming.EventWindows
import org.apache.spark.sql.streaming.Trigger

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    val q = EventWindows.streamingCustomSessionize(spark, "/root/testdata/sf0.001")
      .writeStream.format("memory").queryName("probe_sessions").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println("active after drain: " + q.isActive)
    spark.sql("SELECT count(*) AS n_closed, sum(n_events) AS events_in_closed FROM probe_sessions").show()
    spark.stop()
  }
}
