package graft.tools

import graft.GraftSession
import graft.streaming.EventWindows
import org.apache.spark.sql.streaming.Trigger

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "8")
    val dir = "/root/testdata/sf0.001"
    val q = EventWindows.streamingSlidingCounts(spark, dir)
      .writeStream.format("memory").queryName("probe_sliding").outputMode("complete")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println("stream active after drain: " + q.isActive)
    spark.sql("SELECT count(*) AS n, sum(cnt) AS total_events FROM probe_sliding").show()
    spark.stop()
  }
}
