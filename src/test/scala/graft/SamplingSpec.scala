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

  test("q97 stratum cap: two-level rank == per-stratum window; widths agree; caps hold") {
    import org.apache.spark.sql.expressions.Window
    val got = Sampling.stratumCapSample(spark, TestSpark.Sf0001)
      .as[(Long, String, Long)].collect().toSet
    // the single per-stratum window the two-level form avoids
    val naive = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("lang"),
        md5(concat(col("doc_id").cast("string"), lit(":42"))).as("skey"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("skey"), col("doc_id"))).cast("long"))
      .filter(col("pos") <= 50)
      .select(col("doc_id"), col("lang"), col("pos"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == naive)
    // fan-out width is not a semantics knob (same argument as q86)
    val wide = Sampling.stratumCapSample(spark, TestSpark.Sf0001, prefixChars = 3)
      .as[(Long, String, Long)].collect().toSet
    assert(wide == naive)
    // every stratum capped at min(n, stratum size), positions are 1..cap
    val langTotals = Tables.documents(spark, TestSpark.Sf0001)
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val cap = math.min(50L, langTotals(lang))
      assert(rows.size == cap, s"$lang kept ${rows.size}, want $cap")
      assert(rows.map(_._3).toSeq.sorted == (1L to cap), s"$lang positions")
    }
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

  test("q129 cluster-balanced sample: cap binds, rank is a permutation, deterministic") {
    import graft.operators.Similarity
    val dir = TestSpark.Sf0001
    val (nClusters, cap) = (8, 40L)
    // the invariant row the oracle pins: full count, zero violations
    val inv = Sampling.clusterBalancedSample(spark, dir, nClusters, cap)
      .as[(Long, Long, Long)].head()
    val nVecs = graft.Tables.embeddings(spark, dir).count()
    assert(inv == ((nVecs, 0L, 0L)))
    // the cap must actually bind on the fixture — at least one cluster
    // larger than cap, else over_cap/underfill are vacuous
    val e = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val cents = Similarity.trainCentroids(e, nClusters, 3)
    val sizes = Similarity.ivfAssign(e, cents)
      .groupBy(col("list_id")).count().as[(Long, Long)].collect()
    assert(sizes.exists(_._2 > cap), "fixture should have a cluster over cap")
    assert(sizes.map(_._2).sum == nVecs)
    // the underlying rank is a complete 1..size permutation per cluster —
    // the property the two violation counters summarize
    val assigned = Similarity.ivfAssign(e, cents)
      .select(col("vec_id"), col("list_id").as("cluster"))
    val ranked = Sampling.hashRankWithin(assigned, "cluster", "vec_id", 42L, 2)
    val bad = ranked.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), countDistinct(col("pos")).as("np"),
        min(col("pos")).as("lo"), max(col("pos")).as("hi"))
      .filter(col("np") =!= col("n") || col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.count() == 0)
    // seeded: a second run reproduces the same invariant row bit-for-bit
    val inv2 = Sampling.clusterBalancedSample(spark, dir, nClusters, cap)
      .as[(Long, Long, Long)].head()
    assert(inv2 == inv)
  }

  test("q187 split leakage: planted pairs land in the cells their computed splits dictate") {
    def text(tag: String, last: String = "zz"): String = {
      val words = (for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$tag$a$b").take(53)
      ("the" +: words :+ s"the $tag$last").mkString(" ")
    }
    // pair (1,2) within source s1; pair (3,4) across s1/s2; 5 pairless
    val rows = Seq(
      (1L, text("ta"), "en", "s1"), (2L, text("ta", "qq"), "en", "s1"),
      (3L, text("tb"), "en", "s1"), (4L, text("tb", "rr"), "en", "s2"),
      (5L, text("tc"), "en", "s2"))
    val dir = java.nio.file.Files.createTempDirectory("graft_leak").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // expected cells derived from the SAME split function, driver-side
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"),
        Sampling.splitOf(col("source"), 42L).as("g"),
        Sampling.splitOf(col("doc_id").cast("string"), 42L).as("d"))
      .as[(Long, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def cell(a: String, b: String) = if (a <= b) (a, b) else (b, a)
    val wantG = Seq((1L, 2L), (3L, 4L))
      .groupBy { case (a, b) => cell(splits(a)._1, splits(b)._1) }
      .view.mapValues(_.size.toLong).toMap
    val wantD = Seq((1L, 2L), (3L, 4L))
      .groupBy { case (a, b) => cell(splits(a)._2, splits(b)._2) }
      .view.mapValues(_.size.toLong).toMap
    val got = Sampling.splitLeakageAudit(spark, dir)
      .as[(String, String, String, Long, Boolean)].collect()
    val gotG = got.filter(_._1 == "group_aware")
      .map(r => (r._2, r._3) -> r._4).toMap
    val gotD = got.filter(_._1 == "per_doc")
      .map(r => (r._2, r._3) -> r._4).toMap
    assert(gotG == wantG, s"group cells: $gotG vs $wantG")
    assert(gotD == wantD, s"per-doc cells: $gotD vs $wantD")
    // the within-source pair can never leak under the group-aware split
    assert(splits(1L)._1 == splits(2L)._1)
    got.foreach { r => assert(r._5 == (r._2 != r._3)) }
    // both strategies see the same pair relation
    assert(gotG.values.sum == 2L && gotD.values.sum == 2L)
  }
}
