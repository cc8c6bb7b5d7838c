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

  test("q95 unigram LM score: matches a driver-side recomputation; gate splits the corpus") {
    val got = TextAnalysis.unigramLmScore(spark, TestSpark.Sf0001)
      .as[(Long, Long, Double, Boolean)].collect()
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .as[(Long, Seq[String])].collect()
    val vocab = docs.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length }
    val total = vocab.values.map(_.toLong).sum.toDouble
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = docs.map { case (id, ts) =>
      id -> r6(ts.map(t => math.log(vocab(t) / total)).sum / ts.size)
    }.toMap
    assert(got.length == want.size)
    got.foreach { case (id, n, mlp, keep) =>
      assert(n == docs.find(_._1 == id).get._2.size, s"doc $id n_tokens")
      assert(math.abs(mlp - want(id)) <= 1e-6, s"doc $id mean_logp $mlp vs ${want(id)}")
      assert(keep == (mlp >= -3.402), s"doc $id keep")
    }
    val kept = got.count(_._4)
    assert(kept > 0 && kept < got.length, "gate must actually split the fixture corpus")
  }

  test("q96 BM25: engine top-k matches brute-force BM25 over collected token bags") {
    val k1 = 1.2; val b = 0.75; val nQ = 5; val k = 10
    val got = TextAnalysis.bm25TopK(spark, TestSpark.Sf0001, nQ, k)
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .as[(Long, Seq[String])].collect()
    val tf = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, xs) => t -> xs.length }
    }.toMap
    val nDocs = docs.length.toDouble
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val lens = tf.map { case (id, m) => id -> m.values.sum.toDouble }
    val avgLen = lens.values.sum / lens.size
    def idf(t: String) = math.log(1.0 + (nDocs - df(t) + 0.5) / (df(t) + 0.5))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def score(q: Long, d: Long): Double = r4(
      tf(q).keySet.intersect(tf(d).keySet).toSeq.map { t =>
        idf(t) * tf(d)(t) * (k1 + 1) /
          (tf(d)(t) + k1 * (1 - b + b * lens(d) / avgLen))
      }.sum)
    val ids = docs.map(_._1).sorted
    (0L until nQ.toLong).foreach { q =>
      val want = ids.filter(_ != q).map(d => (d, score(q, d)))
        .sortBy { case (d, s) => (-s, d) }.take(k)
      val gotQ = got(q)
      assert(gotQ.map(_._1) == want.map(_._1).toSeq, s"query $q ranking")
      gotQ.zip(want).foreach { case ((_, gs), (_, ws)) =>
        assert(math.abs(gs - ws) <= 1e-4, s"query $q score $gs vs $ws")
      }
    }
  }
}
