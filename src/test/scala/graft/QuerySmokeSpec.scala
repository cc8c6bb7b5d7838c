package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must materialize end-to-end at sf0.001 — the
  * cheapest guard against the class of analysis/runtime crashes that can
  * hide behind a lazily-built DataFrame (round-1 shipped six of them).
  * The noop sink forces every output column through execution, unlike
  * count(), which lets Catalyst prune projections.
  */
class QuerySmokeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name materializes at sf0.001") {
      fn(spark, TestSpark.Sf0001).write.format("noop").mode("overwrite").save()
    }
  }

  test("every oracle key has a matching query") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracles without queries: $unknown")
  }
}
