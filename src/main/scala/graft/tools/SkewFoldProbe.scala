package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

/** One-question probe for the q219 fold (r15 verdict #5): does the FINAL
  * adaptive plan of the aggregate query itself carry the `skew=true`
  * marker, or is the split suppressed once a grouping stage sits above
  * the sort-merge join? r13's original measurement said suppressed (the
  * reason q219 runs an instrumented pure-join pass PLUS the answer
  * pass); the r15 verdict asks for a re-test on the repartition(16)
  * shape, because the downstream groupBy is on `grp` — a DIFFERENT key
  * than the join's — so the agg needs its own Exchange regardless and
  * the split adds no extra shuffle.
  *
  * Run: /tmp/graftrun.sh graft.tools.SkewFoldProbe [sfDir]
  */
object SkewFoldProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("skew-fold-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val conf = spark.conf
    Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4096",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => conf.set(k, v) }
    val fact = Tables.lineitem(spark, dir).select(
      when(pmod(col("l_orderkey"), lit(10L)) =!= 0L, lit(1L))
        .otherwise(col("l_partkey")).as("k"),
      col("l_quantity"))
      .repartition(16)
    val dim = Tables.part(spark, dir)
      .select(col("p_partkey").as("k"))
      .withColumn("grp", pmod(col("k"), lit(7L)))

    // variant A: the q219 two-pass incumbent's instrumented pure join
    val pure = fact.join(dim, Seq("k"))
    pure.queryExecution.toRdd.count(): Unit
    val pureMark = pure.queryExecution.executedPlan.toString()
      .contains("skew=true")
    println(s"[probe] pure join (toRdd.count): skew=true -> $pureMark")

    // variant B: the fold candidate — ONE execution of the aggregate
    // query, marker read from ITS final adaptive plan
    val agg = fact.join(dim, Seq("k"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("l_quantity")).as("sum_qty"))
    val rows = agg.collect()
    val aggMark = agg.queryExecution.executedPlan.toString()
      .contains("skew=true")
    println(s"[probe] agg query (collect): skew=true -> $aggMark " +
      s"(${rows.length} groups)")

    // variant C: same but WITHOUT forceOptimizeSkewedJoin (does the
    // no-extra-shuffle check alone allow it? groupBy is on grp, not k)
    conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "false")
    val agg2 = fact.join(dim, Seq("k"))
      .groupBy(col("grp")).agg(count(lit(1)).as("n"))
    agg2.collect(): Unit
    val agg2Mark = agg2.queryExecution.executedPlan.toString()
      .contains("skew=true")
    println(s"[probe] agg query (no force): skew=true -> $agg2Mark")
    spark.stop()
  }
}
