package graft

import graft.functions.TextFunctions
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("q80 observed curation: metrics ride the single pass and match recomputation") {
    val (result, obs) = TextAnalysis.corpusCurationObserved(spark, TestSpark.Sf0001)
    // the action materializes BOTH the rows and the observation
    val rows = result.as[(String, Long)].collect().toSet
    val m = obs.get
    // independent recomputation of every observed counter
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("lang"), TextFunctions.qualityScore(col("text")).as("q"))
      .localCheckpoint(true)
    assert(m("rows_scanned") == docs.count())
    assert(m("rows_kept") == docs.filter(col("q") >= 0.5).count())
    assert(m("mean_kept_quality") ==
      docs.filter(col("q") >= 0.5).agg(round(avg(col("q")), 6))
        .as[Double].head())
    val exactLangs = docs.select(col("lang")).distinct().count()
    val seen = m("langs_seen").asInstanceOf[Long]
    assert(math.abs(seen - exactLangs).toDouble / exactLangs <= 0.1,
      s"HLL langs_seen $seen vs exact $exactLangs")
    // observe() must not change the rows: the observed pipeline's result
    // is exactly q44's
    val plain = TextAnalysis.corpusCuration(spark, TestSpark.Sf0001)
      .as[(String, Long)].collect().toSet
    assert(rows == plain)
  }

  test("q83 heavy hitters: sketch prefilter + exact verify == full-vocab aggregate") {
    val support = 0.002
    val got = TextAnalysis.heavyHitterTokens(spark, TestSpark.Sf0001, support)
      .as[(String, Long)].collect().toSet
    // brute force: the full vocabulary aggregate the sketch form replaces
    val toks = Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(split(col("text"), " ")).as("token"))
      .localCheckpoint(true)
    val threshold = (support * toks.count()).toLong
    val want = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > threshold)
      .as[(String, Long)].collect().toSet
    assert(got == want,
      s"only-got=${got -- want}, missed=${want -- got}")
    assert(want.nonEmpty, "fixture must have heavy hitters above support")
  }
}
