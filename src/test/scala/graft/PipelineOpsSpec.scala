package graft

import graft.operators.{Relational, Sampling, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-8 training-pipeline batch: sequence packing (q84),
  * PII redaction (q85), global shuffle rank (q86), bloom semi-join (q87),
  * tf-idf pairs (q88), repetition metrics (q89), mixture weights (q92).
  * q90/q91 (layout + merge) live in SourcesSpec.
  */
class PipelineOpsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("q84 packing: two-level offsets == single-window oracle; token mass conserved") {
    val got = TextAnalysis.sequencePacking(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // the single global window the distributed form avoids
    val naive = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .withColumn("o", coalesce(sum(col("n")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == naive.length)
    got.zip(naive).foreach { case ((id, n, first, last, k), (nid, nn, o)) =>
      assert(id == nid && n == nn)
      assert(first == o / 256, s"doc $id first_chunk")
      assert(last == (o + n - 1) / 256, s"doc $id last_chunk")
      assert(k == last - first + 1)
    }
    // chunk spans tile the token stream: doc i+1 starts in doc i's last
    // chunk or the next one (concat-and-chunk leaves no gaps)
    got.sliding(2).foreach {
      case Array((_, _, _, lastA, _), (_, _, firstB, _, _)) =>
        assert(firstB == lastA || firstB == lastA + 1)
      case _ =>
    }
  }

  test("q85 redaction: every planted class is counted, scrubbed, and placeholder-typed") {
    // modulus that plants each class, keyed by the pattern-table class name
    val plantMod = Map("ip" -> 5L, "email" -> 7L, "phone" -> 11L,
      "ssn" -> 13L, "card" -> 17L)
    assert(TextAnalysis.piiPatterns.map(_._1).toSet == plantMod.keySet,
      "pattern table and plant table must cover the same classes")
    val rows = TextAnalysis.piiRedaction(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect()
    // base fixture text matches none of the patterns (verified against the
    // corpus), so counts are exactly the planted occurrences — both sides
    rows.foreach { case (id, emails, cards, ssns, ips, phones, _) =>
      val got = Map("email" -> emails, "card" -> cards, "ssn" -> ssns,
        "ip" -> ips, "phone" -> phones)
      plantMod.foreach { case (cls, m) =>
        assert((got(cls) >= 1) == (id % m == 0), s"doc $id $cls=${got(cls)}")
      }
    }
    // rebuild the redacted text with the verb's own expressions: no class's
    // pattern survives, and every planted doc carries its typed placeholder
    val redacted = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), TextAnalysis.redactPii(TextAnalysis.plantedPiiText).as("r"))
    val leftover = TextAnalysis.piiPatterns.map { case (_, _, p) =>
      size(regexp_extract_all(col("r"), lit(p), lit(0))) > 0
    }.reduce(_ || _)
    assert(redacted.filter(leftover).count() == 0L)
    TextAnalysis.piiPatterns.foreach { case (cls, placeholder, _) =>
      val missing = redacted
        .filter(col("doc_id") % plantMod(cls) === 0 && !col("r").contains(placeholder))
        .count()
      assert(missing == 0L, s"$cls docs missing $placeholder")
      // inverse: a placeholder may only appear where its class was planted,
      // so a wrong-placeholder substitution cannot pass either direction
      val spurious = redacted
        .filter(col("doc_id") % plantMod(cls) =!= 0 && col("r").contains(placeholder))
        .count()
      assert(spurious == 0L, s"$cls placeholder in unplanted docs")
    }
    // the loop above derives expected placeholders FROM piiPatterns, so a
    // wrong-placeholder edit to the table would sail through it — pin the
    // literals independently (every class, both directions of the table)
    assert(TextAnalysis.piiPatterns.map(p => p._1 -> p._2).toMap == Map(
      "email" -> "<EMAIL>", "card" -> "<CARD>", "ssn" -> "<SSN>",
      "ip" -> "<IP>", "phone" -> "<PHONE>"), "placeholder literals drifted")
    // and directly on the redacted text: a planted phone doc must carry
    // the literal <PHONE>, a planted email doc the literal <EMAIL>
    assert(redacted.filter(col("doc_id") % 11 === 0 &&
      !col("r").contains("<PHONE>")).count() == 0L)
    assert(redacted.filter(col("doc_id") % 7 === 0 &&
      !col("r").contains("<EMAIL>")).count() == 0L)
  }

  test("q86 shuffle rank: distributed rank == single-window rank, a 0..N-1 permutation") {
    val got = Sampling.globalShuffleRank(spark, TestSpark.Sf0001)
      .as[(Long, Long, String)].collect()
    val n = got.length
    assert(got.map(_._1).sorted.toSeq == (0L until n.toLong))
    val naive = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":42"))).as("k"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("k"), col("doc_id"))).cast("long") - 1)
      .select(col("pos"), col("doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(got.map(t => (t._1, t._2)).toSet == naive)
    // bucket width is a fan-out knob, not a semantics knob: a 3-hex-char
    // (4096-bucket) split must yield the IDENTICAL permutation, because
    // concatenating prefix buckets in bucket order IS the total key order
    val wide = Sampling.globalShuffleRank(spark, TestSpark.Sf0001, prefixChars = 3)
      .as[(Long, Long, String)].collect()
    assert(wide.map(t => (t._1, t._2)).toSet == naive)
  }

  test("q87 bloom semi-join: equals the plain semi-join; prefilter never drops a match") {
    val got = Relational.bloomSemiJoin(spark, TestSpark.Sf0001)
      .as[(Long, String, Double)].collect().toSet
    val urgent = Tables.orders(spark, TestSpark.Sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val want = Tables.customer(spark, TestSpark.Sf0001)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .as[(Long, String, Double)].collect().toSet
    assert(got == want)
  }

  test("q88 tf-idf: engine pairs == brute-force cosine over the pruned vectors") {
    val maxDf = 40L
    val threshold = 0.2
    val got = TextAnalysis.tfidfSimilarityPairs(spark, TestSpark.Sf0001, threshold, maxDf)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // brute force in Scala over collected token bags (500 docs)
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .as[(Long, Seq[String])].collect()
    val nDocs = docs.length.toDouble
    val tf = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, xs) => t -> xs.length }
    }
    val df = tf.flatMap(_._2.keys).groupBy(identity).map { case (t, xs) => t -> xs.length }
      .filter(_._2 <= maxDf)
    val vecs = tf.map { case (id, m) =>
      id -> m.collect { case (t, c) if df.contains(t) =>
        t -> c * math.log(nDocs / df(t))
      }.toMap
    }.toMap
    def cos(a: Map[String, Double], b: Map[String, Double]): Double = {
      val dot = a.collect { case (t, w) if b.contains(t) => w * b(t) }.sum
      val na = math.sqrt(a.values.map(w => w * w).sum)
      val nb = math.sqrt(b.values.map(w => w * w).sum)
      if (na == 0 || nb == 0) 0.0
      else BigDecimal(dot / (na * nb)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ids = vecs.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      c = cos(vecs(ids(i)), vecs(ids(j)))
      if c >= threshold
    } yield (ids(i), ids(j)) -> c).toMap
    assert(got.keySet == want.keySet,
      s"only-got=${got.keySet -- want.keySet}, missed=${want.keySet -- got.keySet}")
    got.foreach { case (k, c) => assert(math.abs(c - want(k)) <= 1e-4, s"pair $k") }
    assert(got.nonEmpty, "fixture should produce at least one pair at 0.2")
  }

  test("q89 repetition metrics: fractions match a direct recomputation") {
    val got = TextAnalysis.repetitionMetrics(spark, TestSpark.Sf0001)
      .as[(Long, Double, Double, Boolean)].collect()
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got.length == docs.size)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (id, dupFrac, topFrac, keep) =>
      val ts = docs(id)
      val sh = ts.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val wantDup = if (sh.isEmpty) 0.0 else r6((sh.size - sh.distinct.size).toDouble / sh.size)
      val wantTop = r6(ts.groupBy(identity).values.map(_.size).max.toDouble / ts.size)
      assert(dupFrac == wantDup, s"doc $id dup_frac")
      assert(topFrac == wantTop, s"doc $id top_frac")
      assert(keep == (dupFrac <= 0.1 && topFrac <= 0.1), s"doc $id keep")
    }
  }

  test("q98 cross-source matrix: cells are unordered and conserve the q17 pair mass") {
    val cells = graft.operators.Dedup.crossSourceDupMatrix(spark, TestSpark.Sf0001)
      .as[(String, String, Long, Double)].collect()
    cells.foreach { case (a, b, n, j) =>
      assert(a <= b, s"cell ($a,$b) must be unordered (least,greatest)")
      assert(n > 0 && j >= 0.5, s"cell ($a,$b) n=$n avg=$j")
    }
    val nPairs = graft.operators.Dedup.ngramJaccardPairs(spark, TestSpark.Sf0001).count()
    assert(cells.map(_._3).sum == nPairs, "matrix must conserve total pair count")
    assert(nPairs > 0, "fixture must have near-dup pairs")
  }

  test("q99 diversity stats: entropies match a driver-side recomputation") {
    val (nDocs, nTokens, vocabSize, tokEnt, langEnt) =
      TextAnalysis.corpusDiversityStats(spark, TestSpark.Sf0001)
        .as[(Long, Long, Long, Double, Double)].head()
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("lang"), split(col("text"), " ").as("toks"))
      .as[(String, Seq[String])].collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def entropy(counts: Iterable[Int]): Double = {
      val total = counts.sum.toDouble
      r6(-counts.map { c => val p = c / total; p * math.log(p) }.sum)
    }
    val vocab = docs.flatMap(_._2).groupBy(identity).map(_._2.length)
    val langs = docs.map(_._1).groupBy(identity).map(_._2.length)
    assert(nDocs == docs.length)
    assert(nTokens == docs.map(_._2.size.toLong).sum)
    assert(vocabSize == vocab.size)
    assert(math.abs(tokEnt - entropy(vocab)) <= 1e-6, s"token entropy $tokEnt")
    assert(math.abs(langEnt - entropy(langs)) <= 1e-6, s"lang entropy $langEnt")
    // sanity: entropies are positive and bounded by ln(support size)
    assert(tokEnt > 0 && tokEnt <= math.log(vocabSize.toDouble) + 1e-9)
    assert(langEnt > 0 && langEnt <= math.log(langs.size.toDouble) + 1e-9)
  }

  test("q100 snapshot diff: counts follow the v1/v2 modular lineage exactly") {
    val got = graft.sources.Sources.snapshotDiff(spark, TestSpark.Sf0001)
      .as[(String, Long)].collect().toMap
    val ids = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id")).as[Long].collect()
    // v1 = %3!=0; v2 = v1 merged with " [rev2]" updates of every even id
    val added = ids.count(id => id % 3 == 0 && id % 2 == 0).toLong
    val changed = ids.count(id => id % 3 != 0 && id % 2 == 0).toLong
    val unchanged = ids.count(id => id % 3 != 0 && id % 2 != 0).toLong
    assert(got.getOrElse("added", 0L) == added)
    assert(got.getOrElse("changed", 0L) == changed)
    assert(got.getOrElse("unchanged", 0L) == unchanged)
    assert(!got.contains("removed"), "v1 is a subset of v2 by construction")
    assert(added > 0 && changed > 0 && unchanged > 0)
  }

  test("q101 event sequences: manifest matches a driver-side rebuild of each user's ordered actions") {
    val got = graft.streaming.EventWindows.eventSequences(spark, TestSpark.Sf0001)
      .as[(Long, Long, String, String, String)].collect()
    val events = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val byUser = events.groupBy(_._1).view.mapValues(
      _.sortBy(e => (e._3, e._2)).map(_._4).toSeq).toMap
    assert(got.length == byUser.size)
    got.foreach { case (uid, n, first, last, fp) =>
      val seq = byUser(uid)
      assert(n == seq.length, s"user $uid n_events")
      assert(first == seq.head && last == seq.last, s"user $uid endpoints")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(seq.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fp == md, s"user $uid sequence fingerprint")
    }
  }

  test("q102 difficulty binning: tiers partition each language and respect the q57 thresholds") {
    val got = TextAnalysis.difficultyBinning(spark, TestSpark.Sf0001)
      .as[(String, Long, Long)].collect()
    val q = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("lang"), col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("quality"))
    val thr = TextAnalysis.exactQuantileThresholds(q, Seq(0.25, 0.5, 0.75))
      .as[(String, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    val docs = q.as[(String, Long, Double)].collect()
    // driver-side re-tiering with the engine's own thresholds
    val want = docs.map { case (lang, _, quality) =>
      (lang, thr(lang).count(_ < quality).toLong)
    }.groupBy(identity).map { case (k, xs) => (k._1, k._2, xs.length.toLong) }.toSet
    assert(got.toSet == want)
    // tiers partition: per-lang sums equal lang totals; tier ids in 0..3
    val langTotals = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    got.groupBy(_._1).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum == langTotals(lang), s"$lang tier mass")
    }
    assert(got.forall(r => r._2 >= 0 && r._2 <= 3))
    assert(got.map(_._2).distinct.length >= 3, "quartile thresholds must produce multiple tiers")
  }

  test("q92 mixture weights: probabilities sum to 1, temperature flattens the mix") {
    val rows = TextAnalysis.mixtureWeights(spark, TestSpark.Sf0001)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._4).sum - 1.0) <= 1e-4)
    assert(math.abs(rows.map(_._3).sum - 1.0) <= 1e-4)
    // alpha < 1 flattens, and the lang marginal is genuinely skewed
    // (en ≈ 3× fr), so the movement is strict, not vacuous
    val byRaw = rows.sortBy(_._3)
    assert(byRaw.last._4 < byRaw.last._3, "max lang should strictly shrink")
    assert(byRaw.head._4 > byRaw.head._3, "min lang should strictly grow")
    rows.foreach { case (_, _, _, pTemp, exp) =>
      assert(exp == math.floor(pTemp * 100000).toLong)
    }
  }

  test("q103 filter cascade: funnel equals the naive filter-by-filter chain") {
    import graft.functions.{TextFunctions => TF}
    val got = TextAnalysis.filterCascade(spark, TestSpark.Sf0001)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == TextAnalysis.cascadeStages)
    // the semantically-obvious form: apply each gate cumulatively and
    // count survivors after each — n stages, n passes (the shape the
    // one-scan cascade replaces)
    val sh = TF.shingles(col("text"), 3)
    val dupFrac = when(size(sh) > 0,
      round((size(sh) - size(array_distinct(sh))).cast("double")
        / size(sh).cast("double"), 6)).otherwise(lit(0.0))
    val gates = Seq(
      TF.nTokens(col("text")) >= 5,
      round(TF.alphaRatio(col("text")), 6) >= 0.5,
      TF.qualityScore(col("text")) >= 0.5,
      TF.langId(col("text")) === col("lang"),
      dupFrac <= 0.2)
    var dfCur = Tables.documents(spark, TestSpark.Sf0001)
    var nIn = dfCur.count()
    gates.zip(got).foreach { case (gate, (_, stage, gotIn, gotKept, gotDropped)) =>
      dfCur = dfCur.filter(gate)
      val kept = dfCur.count()
      assert(gotIn == nIn, s"$stage n_in")
      assert(gotKept == kept, s"$stage n_kept")
      assert(gotDropped == nIn - kept, s"$stage n_dropped")
      nIn = kept
    }
    // the funnel genuinely attrites at fixture scale
    assert(got.head._3 > got.last._4)
  }

  test("q104 mixture resample: per-lang copy mass hits the target, copies differ by at most one") {
    val got = Sampling.mixtureResample(spark, TestSpark.Sf0001)
      .as[(Long, String, Long)].collect()
    val counts = Tables.documents(spark, TestSpark.Sf0001)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val totalW = counts.values.map(n => math.pow(n.toDouble, 0.7)).sum
    val targets = counts.map { case (lang, n) =>
      val p = BigDecimal(math.pow(n.toDouble, 0.7) / totalW)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      lang -> math.floor(p * 1000).toLong
    }
    // per-lang mass: sum of copies == floor(round(p_temp,6) * budget)
    val byLang = got.groupBy(_._2)
    targets.foreach { case (lang, target) =>
      val copies = byLang.getOrElse(lang, Array.empty).map(_._3)
      assert(copies.sum == target, s"$lang copy mass")
      if (copies.nonEmpty)
        assert(copies.max - copies.min <= 1, s"$lang copy spread")
    }
    // fixture skew (en ≈ 3× fr) + alpha 0.7 upsamples every lang ≥ 1×
    // except possibly the largest; no doc repeats more than ceil(t/n)+1
    assert(got.map(_._3).max >= 2, "low-resource langs should be upsampled")
    // deterministic: same seed reproduces the manifest row for row
    val again = Sampling.mixtureResample(spark, TestSpark.Sf0001)
      .as[(Long, String, Long)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("q105 conversion funnel: counts match a driver-side per-user replay") {
    val got = graft.streaming.EventWindows.conversionFunnel(spark, TestSpark.Sf0001)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq == Seq("view", "click", "purchase"))
    val events = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .as[(Long, Long, String)].collect()
    val byUser = events.groupBy(_._1)
    var survivors = 0L
    val want = Seq("view", "click", "purchase").foldLeft(
      (Map.empty[Long, Long], Seq.empty[Long])) { case ((prev, acc), stage) =>
      val cur = byUser.flatMap { case (uid, evs) =>
        val after = if (acc.isEmpty) Some(Long.MinValue)
                    else prev.get(uid)
        after.flatMap { t0 =>
          val hits = evs.filter(e => e._3 == stage && e._2 > t0)
          if (hits.isEmpty) None else Some(uid -> hits.map(_._2).min)
        }
      }
      (cur, acc :+ cur.size.toLong)
    }._2
    got.zip(want).foreach { case ((i, stage, n), w) =>
      assert(n == w, s"stage $i $stage")
    }
    survivors = got.last._3
    assert(got.head._3 >= got(1)._3 && got(1)._3 >= survivors, "funnel is monotone")
    assert(got.head._3 > 0)
  }

  test("q106 bpe merges: top pairs and PMI match a driver-side corpus rebuild") {
    val got = TextAnalysis.bpeMergeCandidates(spark, TestSpark.Sf0001)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1)
    val texts = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("text")).as[String].collect()
    val toks = texts.map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val pairs = toks.flatMap(t => t.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTok = uni.values.sum.toDouble
    val nPairs = pairs.values.sum.toDouble
    val want = pairs.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(got.length == want.length)
    got.zip(want).zipWithIndex.foreach { case (((rank, pair, cnt, pmi), (wPair, wCnt)), i) =>
      assert(rank == i + 1)
      assert(pair == wPair && cnt == wCnt, s"rank $rank")
      val Array(a, b) = pair.split(" ", 2)
      val wPmi = BigDecimal(math.log((cnt / nPairs) / ((uni(a) / nTok) * (uni(b) / nTok))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(pmi - wPmi) <= 1e-6, s"rank $rank pmi")
    }
  }

  test("q107 chunking: chunks match a driver-side rebuild and cover every token") {
    val got = TextAnalysis.docChunking(spark, TestSpark.Sf0001)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val texts = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    texts.foreach { case (id, text) =>
      val t = text.split(" ", -1)
      val want = (0 until t.length by 24).zipWithIndex.map { case (start, idx) =>
        (idx.toLong, t.slice(start, start + 32).mkString(" "),
          math.min(32, t.length - start).toLong)
      }
      val g = got.getOrElse(id, Array.empty).map { case (_, i, c, n) => (i, c, n) }
      assert(g.toSeq == want, s"doc $id chunks")
      // stride < window: consecutive chunks overlap, so the union covers
      // the doc; rebuild the full token stream from stride-prefixes
      val rebuilt = g.dropRight(1).map(_._2.split(" ", -1).take(24).mkString(" ")) :+
        g.last._2
      assert(rebuilt.mkString(" ") == text, s"doc $id coverage")
    }
  }

  test("q108 oov: per-lang rates match a driver-side top-10 vocab rebuild") {
    val got = TextAnalysis.oovRate(spark, TestSpark.Sf0001)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect()
    val cnt = docs.flatMap(_._3.split(" ", -1)).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val vocab = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(10).map(_._1).toSet
    val perDoc = docs.map { case (_, lang, text) =>
      val t = text.split(" ", -1)
      (lang, t.length.toLong, t.count(!vocab.contains(_)).toLong)
    }
    perDoc.groupBy(_._1).foreach { case (lang, rows) =>
      val (gn, gAvg, gTok) = (got(lang)._2, got(lang)._3, got(lang)._4)
      assert(gn == rows.length.toLong, s"$lang n_docs")
      val wAvg = BigDecimal(rows.map(r => r._3.toDouble / r._2).sum / rows.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val wTok = BigDecimal(rows.map(_._3).sum.toDouble / rows.map(_._2).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gAvg - wAvg) <= 1e-9, s"$lang avg_doc_oov")
      assert(math.abs(gTok - wTok) <= 1e-9, s"$lang token_oov_rate")
    }
    // a 10-of-31 vocabulary must leave real OOV mass at fixture scale
    assert(got.values.exists(_._4 > 0.0))
  }

  test("q109 budget selection: blocked cumsum == single global window; cut is tight") {
    import graft.functions.{TextFunctions => TF}
    val got = TextAnalysis.tokenBudgetSelection(spark, TestSpark.Sf0001)
      .as[(Long, Double, Long, Long)].collect().sortBy(_._4)
    // the single-task global window the value-blocked form avoids
    val naive = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), TF.qualityScore(col("text")).as("q"),
        TF.nTokens(col("text")).cast("long").as("n"))
      .withColumn("cum", sum(col("n")).over(
        Window.orderBy(col("q").desc, col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .as[(Long, Double, Long, Long)].collect().sortBy(_._4)
    val wantKept = naive.filter(_._4 <= 8000L)
    assert(got.toSeq == wantKept.toSeq)
    // greedy tightness: the first excluded doc would overflow the budget
    assert(got.nonEmpty && got.last._4 <= 8000L)
    val firstOut = naive.find(_._4 > 8000L)
    firstOut.foreach { o => assert(got.last._4 + o._3 > 8000L) }
    // selection keeps the best: min kept quality >= max excluded quality
    val excluded = naive.map(_._1).toSet -- got.map(_._1).toSet
    if (excluded.nonEmpty) {
      val minKept = got.map(_._2).min
      val maxExcl = naive.filter(r => excluded.contains(r._1)).map(_._2).max
      assert(minKept >= maxExcl)
    }
  }

  test("q110 bigram lm: mean log-probs match a driver-side add-k model") {
    val got = TextAnalysis.bigramLmScore(spark, TestSpark.Sf0001)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val texts = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val toks = texts.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val v = uni.size.toLong
    val pairCnt = toks.flatMap(_._2.sliding(2).filter(_.length == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    toks.foreach { case (id, t) =>
      if (t.length < 2) assert(!got.contains(id), s"doc $id should have no bigrams")
      else {
        val pairs = t.sliding(2).map(_.mkString(" ")).toSeq
        val lps = pairs.map { p =>
          val a = p.split(" ", 2)(0)
          math.log((pairCnt(p) + 0.5) / (uni(a) + v * 0.5))
        }
        val want = BigDecimal(lps.sum / lps.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (_, nPairs, mean) = got(id)
        assert(nPairs == pairs.length.toLong, s"doc $id n_pairs")
        assert(math.abs(mean - want) <= 1e-6, s"doc $id mean_logp")
      }
    }
  }

  test("q111 group split: every source lands wholly in one split; thresholds hold") {
    val got = Sampling.groupAwareSplit(spark, TestSpark.Sf0001)
      .as[(Long, String, String)].collect()
    // leakage safety: a source never straddles a split boundary
    got.groupBy(_._2).foreach { case (src, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"source $src straddles splits")
    }
    // the split is the declared pure function of the group key
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, src, split) =>
      val hex = md.digest(s"$src:42".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = if (hex < "cccccccc") "train"
                 else if (hex < "e6666666") "val" else "test"
      assert(split == want, s"doc $id source $src")
    }
    // every doc assigned; all three splits occupied at fixture scale
    assert(got.length == Tables.documents(spark, TestSpark.Sf0001).count())
    assert(got.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("q112 novelty: scores match a driver-side shingle-set rebuild") {
    val got = TextAnalysis.ngramNovelty(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def sh(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set.empty
      else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val ref = docs.filter(_._1 % 2 == 0).flatMap(d => sh(d._2)).toSet
    docs.filter(_._1 % 2 != 0).foreach { case (id, text) =>
      val s = sh(text)
      if (s.isEmpty) assert(!got.contains(id))
      else {
        val seen = s.count(ref.contains)
        val (_, n, gSeen, nov) = got(id)
        assert(n == s.size.toLong, s"doc $id n_shingles")
        assert(gSeen == seen.toLong, s"doc $id n_seen")
        val want = BigDecimal(1.0 - seen.toDouble / s.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(nov - want) <= 1e-9, s"doc $id novelty")
      }
    }
    // the fixture's generated texts overlap heavily but not totally
    val scores = got.values.map(_._4)
    assert(scores.exists(_ > 0.0) || scores.forall(_ == 0.0))
  }

  test("q113 props rollup: per-type stats match a driver-side JSON parse") {
    val got = graft.streaming.EventWindows.eventPropsRollup(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    val raw = Tables.events(spark, TestSpark.Sf0001)
      .select(col("event_type"), col("props")).as[(String, String)].collect()
    val K = """"k"\s*:\s*(-?\d+)""".r
    raw.groupBy(_._1).foreach { case (et, rows) =>
      val ks = rows.flatMap(r => K.findFirstMatchIn(r._2).map(_.group(1).toLong))
      val (_, n, nk, sum, avg, mx) = got(et)
      assert(n == rows.length.toLong, s"$et n_events")
      assert(nk == ks.length.toLong, s"$et n_with_k")
      assert(sum == ks.sum, s"$et sum_k")
      assert(mx == ks.max, s"$et max_k")
      val want = BigDecimal(ks.sum.toDouble / ks.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(avg - want) <= 1e-9, s"$et avg_k")
    }
  }

  test("q114 boilerplate: per-source hot shingles match a driver-side rebuild") {
    val got = TextAnalysis.boilerplateShingles(spark, TestSpark.Sf0001)
      .as[(String, Long, String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    def sh(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set.empty else t.sliding(3).map(_.mkString(" ")).toSet
    }
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val withSh = rows.map(r => (r._1, sh(r._3))).filter(_._2.nonEmpty)
      val nDocs = withSh.length
      val df = withSh.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = df.toSeq
        .map { case (s, d) =>
          (s, d, BigDecimal(d.toDouble / nDocs)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
        .filter { case (_, d, frac) => frac >= 0.08 && d >= 2 }
        .sortBy { case (s, d, _) => (-d, s) }
        .take(5)
      val g = got.getOrElse(src, Array.empty)
        .map { case (_, rank, s, d, frac) => (rank, s, d, frac) }
      assert(g.length == want.length, s"$src row count")
      g.zip(want).zipWithIndex.foreach { case (((rank, s, d, frac), (ws, wd, wfrac)), i) =>
        assert(rank == i + 1 && s == ws && d == wd, s"$src rank ${i + 1}")
        assert(math.abs(frac - wfrac) <= 1e-9, s"$src $s df_frac")
      }
    }
    // the fixture's generated texts genuinely repeat within sources
    assert(got.nonEmpty)
  }

  test("q115 embedding audit: per-label envelope matches a driver-side fold") {
    val got = graft.operators.Similarity.embeddingAudit(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val vecs = Tables.embeddings(spark, TestSpark.Sf0001)
      .select(col("label").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    vecs.groupBy(_._1).foreach { case (label, rows) =>
      // the verb's contract: fold left-to-right in double
      val norms = rows.map(_._2.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
        .map(math.sqrt)
      val (_, n, ndd, mind, mn, an, mx) = got(label)
      assert(n == rows.length.toLong, s"label $label n_vecs")
      assert(ndd == 1L && mind == 64L, s"label $label dims")
      assert(mn == r4(norms.min) && mx == r4(norms.max), s"label $label min/max norm")
      assert(math.abs(an - r4(norms.sum / norms.length)) <= 1e-4, s"label $label avg")
      // the fixture table is unit-normalized; the audit must say so
      assert(mn >= 0.9999 && mx <= 1.0001, s"label $label norm envelope")
    }
  }

  test("q119 curriculum order: two-level rank == single window; tiers descend") {
    val got = TextAnalysis.curriculumOrder(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // a 0..N-1 permutation
    assert(got.map(_._3).toSeq == (0L until got.length.toLong))
    // tier-major, highest first
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // the single global window the two-level form avoids
    val naive = TextAnalysis.perDocTiers(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("tier"),
        md5(concat(col("doc_id").cast("string"), lit(":42"))).as("key"))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("tier").desc, col("key"), col("doc_id"))).cast("long") - 1)
      .select(col("doc_id"), col("tier"), col("pos"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(got.toSeq == naive.toSeq)
    // within a tier the order is the seeded shuffle, not doc_id order
    val firstTier = got.filter(_._2 == got.head._2).map(_._1)
    assert(firstTier.toSeq != firstTier.sorted.toSeq,
      "in-tier order should be shuffled, not id order")
  }

  test("q120 nfc: planted decomposed forms compose; clean docs untouched; SQL door shared") {
    val got = TextAnalysis.textNormalize(spark, TestSpark.Sf0001)
      .as[(Long, Long, String, Long, Boolean)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nRaw, nfc, nNfc, changed) =>
      val planted = (if (id % 3 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0)
      assert(changed == (planted > 0), s"doc $id changed flag")
      // each combining mark merges into its base: one codepoint fewer
      assert(nRaw - nNfc == planted, s"doc $id codepoint delta")
      assert(!nfc.contains("\u0301") && !nfc.contains("\u030A"),
        s"doc $id combining marks survived NFC")
      if (id % 3 == 0) assert(nfc.contains("caf\u00e9"), s"doc $id missing composed e-acute")
      if (id % 5 == 0) assert(nfc.contains("\u00c5"), s"doc $id missing composed A-ring")
    }
    // the SQL registry reaches the same expression (the q79 discipline)
    Tables.documents(spark, TestSpark.Sf0001).limit(5)
      .createOrReplaceTempView("nfc_docs")
    val viaSql = spark.sql(
      "SELECT nfc_normalize(text || ' café') AS s FROM nfc_docs").as[String].collect()
    assert(viaSql.length == 5 && viaSql.forall(_.endsWith("caf\u00e9")))
  }
}
