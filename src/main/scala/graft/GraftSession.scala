package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the scale-oriented defaults every graft entry point
  * uses. The reference configures nothing beyond appName/master
  * (/root/reference/src/preprocessing_pipeline.py:244-247) and leans on
  * Catalyst defaults; we pin the knobs that matter for a large cluster and
  * keep them consistent between Verify, Bench, and tests.
  */
object GraftSession {

  /** Applies graft defaults to an existing builder (so callers can still
    * override master/memory), then creates the session.
    *
    * - AQE on: runtime coalescing of shuffle partitions + skew-join
    *   splitting, the main defense at 100 TB where static partition counts
    *   are always wrong somewhere.
    * - nanosAsLong: the events fixture carries nanosecond timestamps
    *   (pandas-written parquet); Spark's vectorized reader has no nanos
    *   type, so we read them as long and convert once in Tables.events.
    * - UTC session timezone: oracle (DuckDB) parity for all time bucketing.
    */
  def builder(name: String): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    SparkSession.builder()
      .appName(name)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // pin the warehouse off CWD: managed tables (bucketed layouts) go to
      // scratch space regardless of where the harness launches the JVM
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .config("spark.sql.parquet.filterPushdown", "true")
      // static conf, default 100: with a 229-query registry the generated-
      // class cache evicts completely between a query's pass-1 and pass-2
      // bench runs, so every re-run re-paid Janino compilation (~0.1-0.3 s
      // on sub-second queries — exactly the r17 pass-gap regression shape).
      // Generated classes are small; 5000 entries is a few tens of MB in a
      // multi-GB driver and matches how a long-lived production session
      // (Thrift server, notebook) would be tuned.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
  }

  def local(name: String, threads: String = "*"): SparkSession = {
    val s = builder(name).master(s"local[$threads]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
