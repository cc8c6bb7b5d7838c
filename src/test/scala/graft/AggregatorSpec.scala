package graft

import graft.functions.{ArrayMinAgg, ArraySumAgg, WeightedMeanAgg}
import graft.operators.FedAvg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Direct execution of the custom typed Aggregators — including the FedAvg
  * weighted mean, the engine's flagship custom aggregate (SURVEY §2.4 A5).
  */
class AggregatorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("WeightedMeanAgg computes the weighted element-wise mean") {
    val wmean = udaf(new WeightedMeanAgg(2))
    val df = Seq(
      ("a", 1.0, Seq(1.0f, 10.0f)),
      ("a", 3.0, Seq(5.0f, 2.0f)),
      ("b", 2.0, Seq(4.0f, 4.0f))
    ).toDF("client", "w", "vec")
    val got = df.groupBy($"client").agg(wmean($"w", $"vec").as("m"))
      .as[(String, Seq[Double])].collect().toMap
    // a: (1*1 + 3*5)/4 = 4.0 ; (1*10 + 3*2)/4 = 4.0
    assert(got("a") == Seq(4.0, 4.0))
    assert(got("b") == Seq(4.0, 4.0))
  }

  test("WeightedMeanAgg zero-weight group returns the zero vector, not NaN") {
    val wmean = udaf(new WeightedMeanAgg(2))
    val df = Seq(("a", 0.0, Seq(3.0f, 4.0f))).toDF("client", "w", "vec")
    val got = df.groupBy($"client").agg(wmean($"w", $"vec").as("m"))
      .as[(String, Seq[Double])].head()
    assert(got._2 == Seq(0.0, 0.0))
  }

  test("WeightedMeanAgg takes model width from the data (no declared width)") {
    val wmean = udaf(new WeightedMeanAgg())
    val df = Seq(
      ("a", 1.0, Seq(2.0f, 4.0f, 6.0f)),
      ("a", 1.0, Seq(4.0f, 6.0f, 8.0f)),
      ("b", 2.0, Seq(1.0f))
    ).toDF("client", "w", "vec")
    val got = df.groupBy($"client").agg(wmean($"w", $"vec").as("m"))
      .as[(String, Seq[Double])].collect().toMap
    // widths differ ACROSS groups (3 vs 1) — each group takes its own
    assert(got("a") == Seq(3.0, 5.0, 7.0))
    assert(got("b") == Seq(1.0))
  }

  test("WeightedMeanAgg rejects mixed widths within a group") {
    val wmean = udaf(new WeightedMeanAgg())
    val df = Seq(
      ("a", 1.0, Seq(1.0f, 2.0f)),
      ("a", 1.0, Seq(1.0f, 2.0f, 3.0f))
    ).toDF("client", "w", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      df.groupBy($"client").agg(wmean($"w", $"vec").as("m")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("width")),
      s"expected a model-width error, got: ${messages(e)}")
  }

  test("WeightedMeanAgg with a declared width rejects other widths") {
    val wmean = udaf(new WeightedMeanAgg(4))
    val df = Seq(("a", 1.0, Seq(1.0f, 2.0f))).toDF("client", "w", "vec")
    val e = intercept[org.apache.spark.SparkException] {
      df.groupBy($"client").agg(wmean($"w", $"vec").as("m")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("declared width")),
      s"expected a declared-width error, got: ${messages(e)}")
  }

  test("ArrayMinAgg is the element-wise min across rows") {
    val minAgg = udaf(new ArrayMinAgg(3))
    val df = Seq(
      ("g", Seq(5L, 1L, 9L)),
      ("g", Seq(3L, 7L, 2L))
    ).toDF("k", "v")
    val got = df.groupBy($"k").agg(minAgg($"v").as("m")).as[(String, Seq[Long])].head()
    assert(got._2 == Seq(3L, 1L, 2L))
  }

  test("ArraySumAgg is the element-wise sum across rows") {
    val sumAgg = udaf(new ArraySumAgg(3))
    val df = Seq(
      ("g", Seq(1L, -2L, 3L)),
      ("g", Seq(10L, 20L, 30L))
    ).toDF("k", "v")
    val got = df.groupBy($"k").agg(sumAgg($"v").as("m")).as[(String, Seq[Long])].head()
    assert(got._2 == Seq(11L, 18L, 33L))
  }

  test("W4 model save: global weights round-trip through a parquet sink losslessly") {
    val outDir = "target/test-output/global-model"
    val weights = FedAvg.globalRound(spark, TestSpark.Sf0001)
    weights.write.mode("overwrite").parquet(outDir)
    val back = spark.read.parquet(outDir)
    assert(back.count() == FedAvg.Dim)
    assert(back.exceptAll(weights).count() == 0)
    assert(weights.exceptAll(back).count() == 0)
  }

  test("iterated FedAvg (q60): per-round chain matches the closed-form recurrence") {
    val gbar = FedAvg.globalRound(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rounds = FedAvg.iteratedGlobalRounds(spark, TestSpark.Sf0001, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rounds.size == 3 * gbar.size, "one row per (round, dim)")
    // the chain is un-rounded IEEE arithmetic over the 6dp-rounded gbar,
    // so replaying it here must be BIT-exact
    gbar.foreach { case (d, gb) =>
      var g = 0.0
      (1 to 3).foreach { t =>
        g = 0.5 * gb + 0.5 * g
        assert(rounds((t.toLong, d)) == g, s"dim $d round $t: got ${rounds((t.toLong, d))}, want $g")
      }
    }
  }

  test("iterated FedAvg at large R: periodic checkpoints keep the chain bit-exact") {
    // the R-in-the-hundreds regime the default R=3 never exercises: the
    // per-round state checkpoints every 8 rounds (flat lineage, O(R) plan
    // work total instead of O(R²)), and checkpointing must not move a
    // single bit of the recurrence
    val gbar = FedAvg.globalRound(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rounds = FedAvg.iteratedGlobalRounds(spark, TestSpark.Sf0001, rounds = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rounds.size == 40 * gbar.size, "one row per (round, dim)")
    gbar.foreach { case (d, gb) =>
      var g = 0.0
      (1 to 40).foreach { t =>
        g = 0.5 * gb + 0.5 * g
        assert(rounds((t.toLong, d)) == g,
          s"dim $d round $t: got ${rounds((t.toLong, d))}, want $g")
      }
    }
  }

  test("clientMeans (q23 plan) executes and agrees with the flat SQL aggregation") {
    // associativity: client-then-dim explode equals the direct per-dim agg
    val viaAgg = FedAvg.clientMeansExploded(spark, TestSpark.Sf0001)
    val viaSql = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("label").as("client_id"),
        (col("vec_id") % 10 + 1).cast("double").as("w"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("client_id"), col("dim").cast("long").as("dim"))
      .agg(round(sum(col("w") * col("x").cast("double")) / sum(col("w")), 6).as("wmean"))
    assert(viaAgg.exceptAll(viaSql).count() == 0)
    assert(viaSql.exceptAll(viaAgg).count() == 0)
  }

  test("q146 per-round accuracy: driver recompute agrees; metric rises per round") {
    import spark.implicits._
    val preds = FedAvg.predictionsFixture(spark, TestSpark.Sf0001)
      .as[(Long, Long, Double, Long, Long)].collect()
    val want = preds.groupBy(_._1).map { case (r, rows) =>
      val w = rows.map(_._3).sum
      val wc = rows.filter(p => p._4 == p._5).map(_._3).sum
      r -> BigDecimal(wc / w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = FedAvg.perRoundBinaryAccuracy(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    got.foreach { case (r, acc) =>
      assert(math.abs(acc - want(r)) <= 1e-9, s"round $r")
    }
    // the fixture simulates training: example-weighted accuracy must rise
    assert(got(1L) < got(2L) && got(2L) < got(3L),
      "per-round accuracy should improve like the reference's loop")
    // and the metric is genuinely example-WEIGHTED: the unweighted mean
    // differs (weights 1..10 correlate with vec_id parity classes)
    val unweighted = preds.filter(_._1 == 1L)
    val uw = unweighted.count(p => p._4 == p._5).toDouble / unweighted.length
    assert(math.abs(uw - got(1L)) > 1e-6,
      "weighted and unweighted accuracy coincide — the weight is inert")
  }
}
