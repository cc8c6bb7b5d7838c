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

  test("q130 hard negatives: BM25 ranks minus the near-dup/exact gate, re-ranked") {
    val dir = TestSpark.Sf0001
    val (nQ, depth, kNeg) = (5, 20, 10)
    // independent route: the SYMMETRIC self-join pair generator (the
    // engine uses the query-vs-corpus cross form) plus exact text equality
    def falseNegsAt(tau: Double): Set[(Long, Long)] = {
      val nd = graft.operators.Dedup.ngramJaccardPairs(spark, dir, tau)
        .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect()
      val sym = nd.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      val byText = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect()
        .groupBy(_._2).values.map(_.toSeq).filter(_.length > 1)
        .flatMap(g => for (x <- g; y <- g if x._1 != y._1) yield (x._1, y._1))
      (sym ++ byText).filter(_._1 < nQ).toSet
    }
    def expectedAt(tau: Double): Set[(Long, Long, Long, Long, Double)] = {
      val gate = falseNegsAt(tau)
      TextAnalysis.bm25TopK(spark, dir, nQ, depth)
        .as[(Long, Long, Long, Double)].collect()
        .filterNot { case (q, _, c, _) => gate((q, c)) }
        .groupBy(_._1).toSeq.flatMap { case (q, rows) =>
          rows.sortBy(_._2).take(kNeg).zipWithIndex.map {
            case ((_, r, c, s), i) => (q, (i + 1).toLong, c, r, s)
          }
        }.toSet
    }
    for (tau <- Seq(0.5, 0.8)) {
      val got = TextAnalysis.hardNegatives(spark, dir, nQ, depth, kNeg, tau)
        .as[(Long, Long, Long, Long, Double)].collect().toSet
      assert(got == expectedAt(tau), s"tau=$tau")
    }
    // the gate must actually bite on the fixture at the loose threshold,
    // else the anti-join is untested
    val excluded = TextAnalysis.bm25TopK(spark, dir, nQ, depth)
      .select(col("query_id"), col("cand_id")).as[(Long, Long)].collect()
      .toSet.intersect(falseNegsAt(0.5))
    assert(excluded.nonEmpty, "fixture should surface a false negative at tau=0.5")
  }

  test("q132 BPE apply: rank priority on planted overlaps; fixture recompute; conservation") {
    // rank decides overlaps: "a b" (rank 1) beats "b c" (rank 2) on "a b c"
    val docs = Seq((1L, "a b c"), (2L, "a b a b"), (3L, "x"), (4L, "b c a b"))
      .toDF("doc_id", "text")
    val got1 = TextAnalysis
      .bpeApplySegmentsFor(spark, docs, Array(("a b", 1L), ("b c", 2L)))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got1 == Seq((1L, 3L, 2L, 1L), (2L, 4L, 2L, 2L),
      (3L, 1L, 1L, 0L), (4L, 4L, 2L, 2L)))
    // flipped priority: "b c" wins, "a" survives alone
    val got2 = TextAnalysis
      .bpeApplySegmentsFor(spark, docs, Array(("b c", 1L), ("a b", 2L)))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got2.head == ((1L, 3L, 2L, 1L)))
    // same-rank occurrences merge left-to-right non-overlapping: "a a a"
    val tri = Seq((9L, "a a a")).toDF("doc_id", "text")
    val got3 = TextAnalysis.bpeApplySegmentsFor(spark, tri, Array(("a a", 1L)))
      .as[(Long, Long, Long, Long)].head()
    assert(got3 == ((9L, 3L, 2L, 1L)))
    // fixture: engine equals a driver-side greedy recompute and it bites
    val dir = TestSpark.Sf0001
    val merges = TextAnalysis.bpeMergeCandidates(spark, dir, 20)
      .select(col("pair"), col("rank")).as[(String, Long)].collect()
    val ranked = merges.sortBy(_._2).map { p =>
      val i = p._1.indexOf(' '); (p._1.substring(0, i), p._1.substring(i + 1))
    }
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val want = corpus.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val claimed = new Array[Boolean](toks.length)
      var applied = 0
      for ((a, b) <- ranked) {
        var i = 0
        while (i < toks.length - 1) {
          if (!claimed(i) && !claimed(i + 1) && toks(i) == a && toks(i + 1) == b) {
            claimed(i) = true; claimed(i + 1) = true; applied += 1; i += 2
          } else i += 1
        }
      }
      (id, toks.length.toLong, (toks.length - applied).toLong, applied.toLong)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.bpeApplySegments(spark, dir, 20)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    assert(got.map(_._4).sum > 0, "top-20 merges should apply somewhere in the fixture")
    assert(got.forall(r => r._3 + r._4 == r._2), "piece/token conservation")
  }

  test("q134 content-defined chunks: driver recompute; one-token shift resynchronizes") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunksOf(text: String): Seq[(Long, Long, String)] = {
      val t = text.split(" ", -1)
      val cuts = (1 to t.length).filter(i => md5hex(t(i - 1) + ":42").startsWith("0"))
      val starts = 1 +: cuts.map(_ + 1)
      val ends = cuts :+ t.length
      starts.zip(ends).filter { case (s, e) => s <= e }.zipWithIndex.map {
        case ((s, e), i) =>
          (i.toLong, (e - s + 1).toLong, md5hex(t.slice(s - 1, e).mkString(" ")))
      }
    }
    // fixture: engine equals the driver-side recompute, and cuts bite
    val dir = TestSpark.Sf0001
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val want = corpus.flatMap { case (id, text) =>
      chunksOf(text).map { case (ci, n, h) => (id, ci, n, h) }
    }.toSet
    val got = TextAnalysis.contentDefinedChunks(spark, dir)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == want)
    assert(got.exists(_._2 > 0), "cuts should fire somewhere in the fixture")
    // shift robustness: prepending one token perturbs only the region
    // before the first re-synchronizing cut — tails are hash-identical
    val base = corpus.maxBy(_._2.split(" ").length)._2
    val shifted = "zzz " + base
    val a = chunksOf(base).map(_._3)
    val b = chunksOf(shifted).map(_._3)
    assert(a.length >= 3, "need a multi-chunk doc for the tail compare")
    assert(b.drop(b.length - (a.length - 1)) == a.drop(1),
      "all chunks after the first cut must be identical")
    // the same property through the engine path on a planted 2-doc table
    val docs = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val eng = TextAnalysis.contentDefinedChunksFor(docs)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._4).toSeq).toMap
    assert(eng(2L).drop(eng(2L).length - (eng(1L).length - 1)) == eng(1L).drop(1))
  }

  test("q144 packing efficiency matches a driver-side recompute; pack dominates") {
    val dir = TestSpark.Sf0001
    val ctx = 256L
    val ns = Tables.documents(spark, dir)
      .select(col("text")).as[String].collect()
      .map(_.split(" ", -1).length.toLong)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def mkRow(strategy: String, nSeq: Long, used: Long) =
      (strategy, nSeq, nSeq * ctx, used, r6(1.0 - used.toDouble / (nSeq * ctx)))
    val want = Set(
      mkRow("truncate", ns.length.toLong, ns.map(math.min(_, ctx)).sum),
      mkRow("pack", (ns.sum + ctx - 1) / ctx, ns.sum),
      mkRow("chunk", ns.map(n => (n + ctx - 1) / ctx).sum, ns.sum))
    val got = TextAnalysis.packingEfficiencyAudit(spark, dir, ctx)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got == want)
    val byS = got.map(r => r._1 -> r._5).toMap
    assert(byS("pack") <= byS("chunk") && byS("pack") <= byS("truncate"),
      "concat-and-chunk packing must waste the least")
  }

  test("q138 source scorecard matches a driver-side recompute") {
    val dir = TestSpark.Sf0001
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .as[(Long, String, String, String)].collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hashCount = corpus.groupBy(_._4).view.mapValues(_.length).toMap
    val want = corpus.groupBy(_._2).map { case (src, rows) =>
      val toks = rows.map(_._4.split(" ", -1).length.toLong)
      val dup = rows.count(r => hashCount(r._4) > 1)
      val langs = rows.groupBy(_._3).values.map(_.length.toDouble)
      val n = langs.sum
      val ent = math.log(n) - langs.map(c => c * math.log(c)).sum / n
      (src, rows.length.toLong, toks.sum, r6(toks.sum.toDouble / toks.length),
        r6(dup.toDouble / rows.length), r6(ent))
    }.toSet
    val got = TextAnalysis.sourceScorecard(spark, dir)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    assert(got.map(r => (r._1, r._2, r._3)) == want.map(r => (r._1, r._2, r._3)))
    val wm = want.map(r => r._1 -> r).toMap
    got.foreach { g =>
      val w = wm(g._1)
      assert(math.abs(g._4 - w._4) <= 1e-6 && math.abs(g._5 - w._5) <= 1e-6 &&
        math.abs(g._6 - w._6) <= 1e-6, s"source ${g._1}")
      assert(g._5 >= 0.0 && g._5 <= 1.0 && g._6 >= 0.0)
    }
    assert(got.size > 1, "fixture should carry multiple sources")
  }

  test("q135 token drift: driver-side JS + top-k recompute; divergence bounded") {
    val dir = TestSpark.Sf0001
    val corpus = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def marginal(pred: Long => Boolean): Map[String, Double] = {
      val counts = corpus.filter(c => pred(c._1))
        .flatMap(_._2.split(" ", -1)).groupBy(identity)
        .map { case (t, xs) => t -> xs.length.toDouble }
      val n = counts.values.sum
      counts.map { case (t, c) => t -> c / n }
    }
    val p = marginal(_ % 5 != 0)
    val q = marginal(_ % 3 != 0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vocab = p.keySet ++ q.keySet
    val jsRaw = vocab.toSeq.map { t =>
      val (pi, qi) = (p.getOrElse(t, 0.0), q.getOrElse(t, 0.0))
      val m = (pi + qi) / 2.0
      (if (pi > 0) pi * math.log(pi / m) else 0.0) +
        (if (qi > 0) qi * math.log(qi / m) else 0.0)
    }.sum / 2.0
    val wantTop = vocab.toSeq
      .map(t => (t, r6(math.abs(p.getOrElse(t, 0.0) - q.getOrElse(t, 0.0)))))
      .sortBy { case (t, d) => (-d, t) }.take(10).zipWithIndex
      .map { case ((t, d), i) => ((i + 1).toLong, t, d) }
    val got = TextAnalysis.tokenDriftReport(spark, dir)
      .as[(Long, String, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._5)).toSeq == wantTop)
    got.foreach { r =>
      assert(math.abs(r._3 - r6(p.getOrElse(r._2, 0.0))) <= 1e-6)
      assert(math.abs(r._4 - r6(q.getOrElse(r._2, 0.0))) <= 1e-6)
      assert(math.abs(r._6 - r6(jsRaw)) <= 1e-6, "js divergence")
      assert(r._6 > 0.0 && r._6 <= math.log(2.0), "JS in (0, ln 2]")
    }
  }

  test("q147 zipf fit matches the closed form on hand-ranked counts") {
    // counts: a×4, b×2, c×1, d×1 → ranks a=1, b=2, then the c=1 tie breaks
    // by token: c=3, d=4 (the histogram+tie rank must equal this order)
    val docs = Seq((1L, "a a b c"), (2L, "a a b d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.zipfAuditFor(docs)
      .as[(Long, Double, Double, Double)].head()
    val pts = Seq((1.0, 4.0), (2.0, 2.0), (3.0, 1.0), (4.0, 1.0))
      .map { case (r, c) => (math.log(r), math.log(c)) }
    val n = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val (sxx, syy) = (pts.map(p => p._1 * p._1).sum, pts.map(p => p._2 * p._2).sum)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val intercept = (sy - sx * slope) / n
    val r2 = math.pow(n * sxy - sx * sy, 2) /
      ((n * sxx - sx * sx) * (n * syy - sy * sy))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got._1 == 4L)
    assert(math.abs(got._2 - r6(slope)) <= 1e-6, s"slope ${got._2} vs $slope")
    assert(math.abs(got._3 - r6(intercept)) <= 1e-6)
    assert(math.abs(got._4 - r6(r2)) <= 1e-6)
    assert(got._2 < 0.0, "rank-frequency slope must be negative")
  }

  test("q147 zipf rank equals the single-window row_number rank on the fixture") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val vocab = docs
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .select(col("token")).distinct().count()
    val got = TextAnalysis.zipfAudit(spark, TestSpark.Sf0001)
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 == vocab)
    assert(got._4 >= 0.0 && got._4 <= 1.0, "R² in [0,1]")
  }

  test("q148 scorer agreement: cells partition the corpus and κ matches the cells") {
    val got = TextAnalysis.scorerAgreement(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    val (n00, n01, n10, n11, po, pe, kappa) = got
    val nDocs = Tables.documents(spark, TestSpark.Sf0001).count()
    assert(n00 + n01 + n10 + n11 == nDocs, "cells must partition the corpus")
    val n = (n00 + n01 + n10 + n11).toDouble
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(math.abs(po - r6((n00 + n11) / n)) <= 1e-6)
    val peWant = ((n10 + n11) * (n01 + n11) + (n00 + n01) * (n00 + n10)) / (n * n)
    assert(math.abs(pe - r6(peWant)) <= 1e-6)
    assert(math.abs(kappa - r6((po - pe) / (1.0 - pe))) <= 2e-6)
    assert(kappa <= 1.0 + 1e-9)
  }

  test("q149 calibration: ECE matches a per-doc recomputation") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(TextFunctions.tokens(col("text")).as("t"))
      .select(size(array_distinct(col("t"))).as("d"), size(col("t")).as("n"))
      .as[(Int, Int)].collect()
    val perDoc = docs.map { case (d, nt) =>
      val conf = d.toDouble / nt
      (math.min(math.floor(conf * 10).toLong, 9L), conf,
        if (nt >= 20) 1.0 else 0.0)
    }
    val bins = perDoc.groupBy(_._1).map { case (_, rs) =>
      val nb = rs.length
      (nb, math.abs(rs.map(_._3).sum / nb - rs.map(_._2).sum / nb))
    }
    val eceWant = bins.map { case (nb, gap) => nb * gap }.sum / docs.length
    val maxWant = bins.map(_._2).max
    val got = TextAnalysis.calibrationAudit(spark, TestSpark.Sf0001)
      .as[(Long, Long, Double, Double)].head()
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got._1 == docs.length.toLong)
    assert(got._2 == bins.size.toLong && got._2 <= 10L)
    assert(math.abs(got._3 - r6(eceWant)) <= 2e-6, s"ece ${got._3} vs $eceWant")
    assert(math.abs(got._4 - r6(maxWant)) <= 2e-6)
  }

  test("q153 fertility audit: corpus rollup agrees with the per-doc q25 metrics") {
    // doc grain and corpus grain share one tokenizer by construction —
    // this pins that the rollup really is the q25 columns aggregated
    val perDoc = TextAnalysis.docMetrics(spark, TestSpark.Sf0001)
      .join(spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
        .select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("w"),
        sum(col("n_subwords")).as("s"), sum(col("n_chars_c")).as("c"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, (r._2, r._3, r._4, r._5))).toMap
    val audit = TextAnalysis.tokenizerFertilityAudit(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(audit.map(_._1).toSet == perDoc.keySet)
    audit.foreach { a =>
      val (nd, w, s, c) = perDoc(a._1)
      assert((a._2, a._3, a._4, a._5) == ((nd, w, s, c)), s"lang ${a._1} counts")
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(a._6 == r6(s.toDouble / w), s"lang ${a._1} fertility")
      assert(a._7 == r6(c.toDouble / s), s"lang ${a._1} chars/subword")
      assert(a._6 >= 1.0, "a word is at least one subword")
    }
  }

  test("q158 effective-token budget: closed form matches a driver-side replay; bounds hold") {
    val budget = 1000000L
    val got = TextAnalysis.effectiveTokenBudget(spark, TestSpark.Sf0001, budget)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    val tokens = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.map(_._1).toSet == tokens.keySet)
    val target = budget / tokens.size
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (src, n, t, full, eff, util) =>
      assert(n == tokens(src) && t == target)
      assert(full == target / n)
      val p = math.pow(0.5, full.toDouble)
      val rem = target - full * n
      val effWant = n * 2.0 * (1 - p) + rem * p
      assert(eff == r6(effWant), s"$src eff $eff vs $effWant")
      assert(util == r6(effWant / target), s"$src util")
      // repeated epochs can never be worth more than the target slice,
      // nor more than the n/(1-r) infinite-epoch ceiling
      assert(eff <= target + 1e-6 && eff <= n * 2.0 + 1e-6)
      assert(util > 0.0 && util <= 1.0)
    }
  }

  test("q160 compression signal: discriminates, deterministic, fixture inside the band") {
    import org.apache.spark.sql.functions.col
    // the signal must separate template soup from ID soup — that is its job
    val rnd = new scala.util.Random(17)
    val repetitive = Seq.fill(120)("lorem ipsum dolor").mkString(" ")
    val random = (0 until 360)
      .map(_ => (0 until 5).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      .mkString(" ")
    val probe = Seq((1L, "s", repetitive), (2L, "s", random))
      .toDF("doc_id", "source", "text")
    val ratios = TextAnalysis.compressionRatiosFor(probe)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._5.toDouble / r._4)).toMap
    assert(ratios(1L) < 0.1, s"template soup ratio ${ratios(1L)}")
    assert(ratios(2L) > 2.0 * ratios(1L), s"ID soup must compress far worse: $ratios")
    // per-doc profile is deterministic across invocations (fixed JDK zlib)
    val a = TextAnalysis.compressionRatiosFor(probe).collect().toSet
    val b = TextAnalysis.compressionRatiosFor(probe).collect().toSet
    assert(a == b)
    // the fixture corpus sits fully inside the sanity band
    val fx = TextAnalysis.compressionSignal(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(fx.nonEmpty && fx.forall(_._4 == 0L),
      s"violations: ${fx.filter(_._4 != 0L).mkString(",")}")
  }

  test("q162 pii scorecard: the rollup is exactly q85's per-doc counts aggregated") {
    val src = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select(col("doc_id"), col("source"))
    val perDoc = TextAnalysis.piiRedaction(spark, TestSpark.Sf0001)
      .join(src, "doc_id")
      .select(col("source"), col("n_emails"), col("n_cards"), col("n_ssns"),
        col("n_ips"), col("n_phones"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val want = perDoc.groupBy(_._1).map { case (s, rows) =>
      val sums = (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum,
        rows.map(_._5).sum, rows.map(_._6).sum)
      val withAny = rows.count(r => r._2 + r._3 + r._4 + r._5 + r._6 > 0).toLong
      (s, (rows.length.toLong, sums, withAny))
    }
    val got = TextAnalysis.piiSourceScorecard(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, (r._2, (r._3, r._4, r._5, r._6, r._7), r._8, r._9))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (s, (nd, sums, withAny)) =>
      val (gnd, gsums, gAny, rate) = got(s)
      assert((gnd, gsums, gAny) == ((nd, sums, withAny)), s"source $s")
      val r6 = BigDecimal(withAny.toDouble / nd)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rate == r6, s"source $s rate")
      assert(gAny > 0L, s"source $s should carry planted PII at these moduli")
    }
  }

  test("q167 PSI drift audit matches a driver-side replay and flags a planted shift") {
    // fixture PSI recomputed from the raw splits
    def replay(rows: Seq[(Long, String)]): Double = {
      val buckets = rows.map(_._2).distinct
      val a = rows.filter(_._1 % 5 != 0)
      val b = rows.filter(_._1 % 3 != 0)
      val psi = buckets.map { bk =>
        val pa = (a.count(_._2 == bk) + 1.0) / (a.size + buckets.size)
        val pb = (b.count(_._2 == bk) + 1.0) / (b.size + buckets.size)
        (pa - pb) * math.log(pa / pb)
      }.sum
      BigDecimal(psi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val got = TextAnalysis.psiDriftAudit(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long, Double, String)].collect()
      .map(r => (r._1, (r._2, r._5, r._6))).toMap
    assert(got.keySet == Set("lang", "len_bucket"))
    val wantLang = replay(docs.map(d => (d._1, d._2)))
    assert(got("lang")._2 == wantLang, s"lang PSI ${got("lang")._2} vs replay $wantLang")
    val wantLen = replay(docs.map(d =>
      (d._1, math.min(d._3.codePointCount(0, d._3.length) / 100, 10).toString)))
    assert(got("len_bucket")._2 == wantLen)
    // planted MAJOR drift: ref split speaks en, cur split speaks zz
    val planted = (0L until 300L).map { i =>
      val lang = if (i % 5 == 0) "zz" else if (i % 3 == 0) "en"
                 else if (i % 2 == 0) "en" else "zz"
      (i, s"w$i", lang, "s0", 3L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_psi").toString
    planted.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val bands = TextAnalysis.psiDriftAudit(spark, dir)
      .as[(String, Long, Long, Long, Double, String)].collect()
      .map(r => r._1 -> r._6).toMap
    assert(bands("lang") == "major", s"planted lang shift must flag major: $bands")
    assert(bands("len_bucket") == "stable", "uniform lengths must stay stable")
  }

  test("q172 Heaps audit: open vocab fits beta=1 exactly, closed vocab beta=0, fixture replays") {
    // every doc contributes 4 brand-new tokens -> V(n) = n, so the log-log
    // fit is EXACTLY beta=1, logK=0 (and R^2 = 1) at every checkpoint
    val open = (1L to 100L).map { i =>
      (i, (0 until 4).map(j => s"tok_${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val fitOpen = graft.operators.TextAnalysis.heapsAuditFor(open)
      .select("heaps_beta", "heaps_logk", "r_squared")
      .as[(Double, Double, Double)].head()
    assert(fitOpen == ((1.0, 0.0, 1.0)), s"open vocab: $fitOpen")
    // a 3-token closed vocabulary saturates immediately -> beta = 0 (and
    // the value is +0.0, not -0.0 — the IEEE sign the audit normalizes)
    val closed = (1L to 100L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val fitClosed = graft.operators.TextAnalysis.heapsAuditFor(closed)
      .select("heaps_beta").as[Double].head()
    assert(fitClosed == 0.0 &&
      !(java.lang.Double.doubleToRawLongBits(fitClosed) != 0L), s"closed vocab: $fitClosed")
    // fixture checkpoints replay driver-side: cumulative tokens and
    // first-occurrence vocabulary at each doc_id decile
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val maxId = docs.map(_._1).max
    val got = graft.operators.TextAnalysis.heapsAudit(spark, TestSpark.Sf0001)
      .select("k", "thr", "n_tokens", "vocab").as[(Int, Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    (1 to 10).foreach { k =>
      val thr = maxId * k / 10
      val pre = docs.filter(_._1 <= thr)
      val nt = pre.map(_._2.split(" ", -1).length.toLong).sum
      val vb = pre.flatMap(_._2.split(" ", -1)).distinct.length.toLong
      assert(got(k) == ((thr, nt, vb)), s"checkpoint $k: ${got(k)} vs ($thr, $nt, $vb)")
    }
  }

  test("q195 gate ablation: marginal >= funnel attribution >= unique; totals consistent with q103") {
    val abl = TextAnalysis.gateAblation(spark, TestSpark.Sf0001)
      .as[(Long, String, Long, Long, Long, Long)].collect().sortBy(_._1)
    val funnel = TextAnalysis.filterCascade(spark, TestSpark.Sf0001)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(abl.map(_._2).toSeq == TextAnalysis.cascadeStages)
    abl.foreach { case (i, s, nDocs, anyFail, marginal, only) =>
      // the funnel charges first-fail: its per-stage drop can never
      // exceed the order-free marginal, and the unique count never
      // exceeds either
      assert(marginal >= funnel(i), s"$s: marginal $marginal < funnel ${funnel(i)}")
      assert(only <= marginal && only <= funnel(i) + marginal)
      assert(anyFail <= nDocs)
    }
    // first-fail attributions partition the failing docs: funnel drops
    // sum to any_fail exactly
    assert(funnel.values.sum == abl.head._4,
      s"funnel ${funnel.values.sum} != any_fail ${abl.head._4}")
    // uniques are disjoint subsets of the failing docs
    assert(abl.map(_._6).sum <= abl.head._4)
    // the stage-0 funnel drop IS its marginal (nothing precedes it)
    assert(abl.head._5 == funnel(0L))
  }

  test("q191 data card: every metric equals the owning operator's own number") {
    val card = TextAnalysis.corpusDataCard(spark, TestSpark.Sf0001)
      .as[(String, Double)].collect().toMap
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    assert(card("n_docs") == docs.count().toDouble)
    assert(card("n_langs") == docs.select(col("lang")).distinct().count().toDouble)
    assert(card("n_sources") ==
      docs.select(col("source")).distinct().count().toDouble)
    // the pair metrics equal the q17 operator's own relation
    val pairs = graft.operators.Dedup
      .ngramJaccardPairsFor(docs, 0.5).localCheckpoint(true)
    assert(card("neardup_pairs") == pairs.count().toDouble)
    assert(card("neardup_docs") == pairs.select(col("doc_a").as("id"))
      .unionByName(pairs.select(col("doc_b").as("id")))
      .distinct().count().toDouble)
    // contamination equals q59's report row count (same two-arm contract)
    val contam = graft.operators.Dedup
      .decontaminationReport(spark, TestSpark.Sf0001).count()
    assert(card("eval_contaminated") == contam.toDouble)
    // entropy/quality sanity: entropy in [0, ln n_langs], quality in (0,1)
    assert(card("lang_entropy") >= 0.0
      && card("lang_entropy") <= math.log(card("n_langs")) + 1e-9)
    assert(card("mean_quality") > 0.0 && card("mean_quality") < 1.0)
    assert(card("exact_dup_groups") == 0.0, "fixture has no exact dups")
  }

  test("q188 context sweep matches hand-computed cells; pack dominates everywhere") {
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "), "en", "s0")
    val dir = java.nio.file.Files.createTempDirectory("graft_ctx").toString
    Seq(doc(1, 100), doc(2, 300), doc(3, 50))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.packingContextSweep(spark, dir, Seq(128L, 256L))
      .as[(Long, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((128L, "truncate")) == ((3L, 384L, 278L, r6(1 - 278.0 / 384))))
    assert(got((128L, "pack")) == ((4L, 512L, 450L, r6(1 - 450.0 / 512))))
    assert(got((128L, "chunk")) == ((5L, 640L, 450L, r6(1 - 450.0 / 640))))
    assert(got((256L, "truncate")) == ((3L, 768L, 406L, r6(1 - 406.0 / 768))))
    assert(got((256L, "pack")) == ((2L, 512L, 450L, r6(1 - 450.0 / 512))))
    assert(got((256L, "chunk")) == ((4L, 1024L, 450L, r6(1 - 450.0 / 1024))))
    // pack never wastes more than chunk at the same context (it merges
    // exactly chunk's per-doc tails), on the fixture corpus too
    val fix = TextAnalysis.packingContextSweep(spark, TestSpark.Sf0001)
      .as[(Long, String, Long, Long, Long, Double)].collect()
    fix.groupBy(_._1).foreach { case (ctx, rows) =>
      val byStrat = rows.map(r => r._2 -> r._6).toMap
      assert(byStrat("pack") <= byStrat("chunk"), s"ctx $ctx: pack > chunk")
    }
  }

  test("q184 UniMax allocation matches hand-computed waterfills in all three regimes") {
    // langs sized 10/40/70/80/300 -> capacities scale with maxEpochs
    val sizes = Seq("aa" -> 10, "bb" -> 40, "cc" -> 70, "dd" -> 80, "ee" -> 300)
    val rows = sizes.flatMap { case (l, n) =>
      (0 until n).map(i => (l.hashCode.toLong * 1000 + i, s"$l doc $i", l, "s0"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_unimax").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run(b: Long, e: Long) =
      TextAnalysis.unimaxAllocation(spark, dir, budget = b, maxEpochs = e)
        .as[(String, Long, Long, Boolean, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // mixed regime, E=1: caps 10+40 fit, waterline (200-50)/3 = 50
    val m1 = run(200L, 1L)
    assert(m1("aa") == (("aa", 10L, 10L, true, 10.0, 1.0)))
    assert(m1("bb") == (("bb", 40L, 40L, true, 40.0, 1.0)))
    assert(m1("cc") == (("cc", 70L, 70L, false, 50.0, r6(50.0 / 70))))
    assert(m1("dd") == (("dd", 80L, 80L, false, 50.0, 0.625)))
    assert(m1("ee") == (("ee", 300L, 300L, false, 50.0, r6(50.0 / 300))))
    // budget above total capacity: everyone capped, nobody divides by 0
    val m2 = run(1000L, 1L)
    assert(m2.values.forall(_._4), "all langs must cap when budget >= capacity")
    assert(m2("ee")._5 == 300.0 && m2("ee")._6 == 1.0)
    // upsampling regime, E=3: low-resource langs repeat up to 3 epochs
    val m3 = run(600L, 3L)
    assert(m3("aa") == (("aa", 10L, 30L, true, 30.0, 3.0)))
    assert(m3("bb") == (("bb", 40L, 120L, true, 120.0, 3.0)))
    assert(m3("cc")._4 == false && m3("cc")._5 == 150.0
      && m3("cc")._6 == r6(150.0 / 70))
    assert(m3("dd")._5 == 150.0 && m3("dd")._6 == 1.875)
    assert(m3("ee")._5 == 150.0 && m3("ee")._6 == 0.5)
    // invariant: allocation mass never exceeds budget (± 6dp rounding)
    Seq(m1, m3).foreach { m =>
      assert(m.values.map(_._5).sum <= 200.0001 + (if (m eq m3) 400.0 else 0.0))
    }
  }

  test("q174 DoReMi weights: trajectory replays driver-side, mass shifts toward high-excess sources") {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = graft.operators.TextAnalysis.doremiMixtureWeights(spark, TestSpark.Sf0001)
      .as[(Int, String, Long, Double, Double, Double)].collect()
    val sources = rows.map(_._2).distinct.sorted
    val byIter = rows.groupBy(_._1)
    assert(byIter.keySet == (0 to 5).toSet)
    // driver replay of the multiplicative-weights recurrence at 6dp steps
    val excess = rows.filter(_._1 == 0).map(r => r._2 -> r._5).toMap
    val boost = excess.map { case (s0, e) => s0 -> r6(math.exp(e)) }
    var w = sources.map(s0 => s0 -> r6(1.0 / sources.length)).toMap
    (0 to 5).foreach { t =>
      val got = byIter(t).map(r => r._2 -> r._6).toMap
      assert(got == w, s"iteration $t: $got vs replay $w")
      val u = sources.map(s0 => s0 -> r6(w(s0) * boost(s0))).toMap
      val tot = (BigDecimal(0) /: sources)((acc, s0) => acc + BigDecimal(u(s0)))
      w = sources.map(s0 => s0 -> r6(u(s0) / tot.toDouble)).toMap
    }
    // each iteration's weights sum to 1 within 6dp rounding slack
    (0 to 5).foreach { t =>
      val sum = byIter(t).map(_._6).sum
      assert(math.abs(sum - 1.0) < 5e-5, s"iteration $t mass $sum")
    }
    // mass moves monotonically toward the max-excess source (if any gap)
    val maxE = excess.maxBy(_._2)
    if (excess.values.max > excess.values.min) {
      val traj = (0 to 5).map(t => byIter(t).find(_._2 == maxE._1).get._6)
      assert(traj.zip(traj.tail).forall { case (a, b) => b >= a },
        s"max-excess source must not lose mass: $traj")
      assert(traj.last > traj.head, s"and must gain overall: $traj")
    }
  }
}