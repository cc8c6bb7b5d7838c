package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's verify_unique_split / stratified-fraction invariants
  * (SURVEY §5.2 item 2), asserted directly. */
class SamplingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("randomSplit: pairwise-disjoint and exhaustive at sf0.001") {
    val (overlap, diff) = Sampling.randomSplitInvariant(spark, TestSpark.Sf0001)
      .as[(Long, Long)].head()
    assert(overlap == 0L, "splits must be pairwise disjoint")
    assert(diff == 0L, "split sizes must sum to the parent count")
  }

  test("randomSplit is deterministic for a fixed seed") {
    val keyed = Tables.orders(spark, TestSpark.Sf0001).select(col("o_orderkey"))
    val a = Sampling.randomClientSplit(keyed, 3).map(_.count()).toSeq
    val b = Sampling.randomClientSplit(keyed, 3).map(_.count()).toSeq
    assert(a == b)
  }

  test("sampleBy fractions within tolerance at sf0.001") {
    val violations = Sampling.sampleByInvariant(spark, TestSpark.Sf0001)
      .as[Long].head()
    assert(violations == 0L)
  }

  test("random split preserves per-client label distribution (reference test_partitioning)") {
    val li = Tables.lineitem(spark, TestSpark.Sf0001).select(col("l_returnflag"))
    val globalFrac = li.filter(col("l_returnflag") === "R").count().toDouble / li.count()
    Sampling.randomClientSplit(li, 4).zipWithIndex.foreach { case (client, i) =>
      val frac = client.filter(col("l_returnflag") === "R").count().toDouble / client.count()
      assert(math.abs(frac - globalFrac) < 0.05,
        s"client $i label fraction $frac drifts from global $globalFrac")
    }
  }

  test("skewed client partitioning hits its per-client label fractions") {
    val violations = Sampling.skewedSplitInvariant(spark, TestSpark.Sf0001).as[Long].head()
    assert(violations == 0L)
  }

  test("repartition introspection reports the requested partition count") {
    val (n, nonEmpty) = Sampling.repartitionIntrospect(spark, TestSpark.Sf0001)
      .as[(Long, Boolean)].head()
    assert(n == 16L && nonEmpty)
  }
}
