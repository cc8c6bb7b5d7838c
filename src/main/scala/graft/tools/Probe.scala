package graft.tools

import graft.GraftSession
import graft.streaming.EventWindows
import org.apache.spark.sql.streaming.Trigger

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    val q = EventWindows.streamingUserTotals(spark, "/root/testdata/sf0.001")
      .writeStream.format("memory").queryName("probe_totals").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println("active after drain: " + q.isActive)
    spark.sql("SELECT count(*) AS n_users, sum(n_events) AS n_events FROM probe_totals").show()
    spark.stop()
  }
}
