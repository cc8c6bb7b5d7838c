package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("A6: approx_count_distinct within tolerance of the exact count") {
    // the raw estimate, range-checked (the query itself only exposes the
    // boolean; this pins the underlying HLL++ accuracy)
    val rows = Tables.lineitem(spark, TestSpark.Sf0001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.1, s"flag $flag: approx $approx vs exact $exact (err $err)")
    }
    val flags = Relational.distinctStats(spark, TestSpark.Sf0001)
      .filter(!col("approx_within_tol")).count()
    assert(flags == 0L)
  }

  test("q13 money rounding is exact decimal (half-cent case)") {
    // 19570.815 stored as a double is 19570.81499…; decimal-operand
    // arithmetic must land on .82 via exact decimal rounding, matching any
    // engine that does money math in decimal
    val df = Seq((170.181, 0.05, 0.01)).toDF("l_extendedprice", "l_discount", "l_tax")
    val charged = df.select(
      round(col("l_extendedprice").cast("decimal(12,2)")
        * (lit(1) - col("l_discount").cast("decimal(12,2)"))
        * (lit(1) + col("l_tax").cast("decimal(12,2)")), 2)
        .cast("double").as("charged")).as[Double].head()
    // 170.18 * 0.95 * 1.01 = 163.294171 → 163.29
    assert(charged == 163.29)
  }

  test("bucketed join plans with exactly one Exchange (the aggregation's, not the join's)") {
    // disable auto-broadcast: at fixture scale AQE would broadcast the
    // orders side, which is the right call for small dims but hides the
    // property under test — that two co-bucketed fact tables sort-merge
    // join with no shuffle on either input
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Relational.bucketedJoinRevenue(spark, TestSpark.Sf0001)
      df.collect() // materialize so AQE finalizes the executed plan
      val exec = df.queryExecution.executedPlan
      val finalPlan = exec match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      val exchanges = "(?m)Exchange hashpartitioning".r.findAllIn(finalPlan).length
      assert(exchanges == 1, s"expected 1 exchange (final agg), got $exchanges in:\n$finalPlan")
      assert(finalPlan.contains("SortMergeJoin"), "bucketed join should be a sort-merge join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("q74 as-of join matches the brute-force latest-prior match") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
    val views = ev.filter(_._4 == "view")
    val expected = ev.filter(_._4 == "purchase").map { case (pid, uid, pms, _, pv) =>
      // latest view strictly before the purchase in (ts, event_id) order
      val prior = views.filter(v => v._2 == uid
        && (v._3 < pms || (v._3 == pms && v._1 < pid)))
      val m = if (prior.isEmpty) None
        else Some(prior.maxBy(v => (v._3, v._1)))
      (pid, uid, pv, m.map(_._1), m.map(_._5), m.map(pms - _._3))
    }.toSet
    val got = Relational.asOfPurchaseViews(spark, TestSpark.Sf0001)
      .as[(Long, Long, Double, Option[Long], Option[Double], Option[Long])]
      .collect().toSet
    assert(got == expected)
    // the no-prior-view case must be present and carried as nulls, or the
    // fixture isn't exercising the left-outer arm
    assert(expected.exists(_._4.isEmpty), "fixture has no null-match purchase")
  }

  test("dupGate finds only keys with multiple lineitems") {
    val df = Relational.dupGate(spark, TestSpark.Sf0001)
    assert(df.filter(col("cnt") <= 1).count() == 0)
    assert(df.count() > 0)
  }
}
