package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("probe", "4")
    val raw = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    raw.printSchema()
    raw.filter(col("user_id") === 145)
      .select(col("ts"))
      .filter(col("ts").cast("string").startsWith("17057606177"))
      .show(5, false)
    val ev = Tables.events(spark, "/root/testdata/sf0.01")
    ev.filter(col("user_id") === 145 && unix_millis(col("ts")).between(1705760617000L, 1705760618000L))
      .select(col("ts"), unix_micros(col("ts")).as("us"), unix_millis(col("ts")).as("ms"))
      .show(5, false)
    spark.stop()
  }
}
