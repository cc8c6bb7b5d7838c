package graft

import graft.operators.{Dedup, IncrementalDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The continuous-ingest contract (q64): a persisted shingle index dedups
  * arriving shards without re-shingling the settled corpus, gives the same
  * answer as the from-scratch batch computation, extends itself with each
  * admitted shard, and serves winnowed-fingerprint indexes through the
  * same verb.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** 30 settled docs of 60 pseudo-words; an arriving shard holding one
    * near-dup (single mid-document token swap, Jaccard ≈ 0.9) of each of
    * the first 10 settled docs plus 10 fresh docs drawn from a disjoint
    * vocabulary (cross-Jaccard ≈ 0). Shard ids are offset so every
    * (settled, shard) pair orders as (doc_a, doc_b) in the batch form.
    */
  private lazy val (settled, shard, freshTexts) = {
    val rnd = new scala.util.Random(7)
    def word() = (0 until 5).map(_ => ('a' + rnd.nextInt(13)).toChar).mkString
    def freshWord() = (0 until 5).map(_ => ('n' + rnd.nextInt(13)).toChar).mkString
    val vocab = Vector.fill(300)(word())
    val freshVocab = Vector.fill(300)(freshWord())
    val base = (0L until 30L).map { i =>
      i -> (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val dups = base.take(10).map { case (i, text) =>
      val toks = text.split(" ")
      toks(30) = "zzzzz"
      (i + 1000L) -> toks.mkString(" ")
    }
    val fresh = (0L until 10L).map { i =>
      (i + 2000L) -> (0 until 60).map(_ => freshVocab(rnd.nextInt(freshVocab.size))).mkString(" ")
    }
    (base.toDF("doc_id", "text"), (dups ++ fresh).toDF("doc_id", "text"),
      fresh.toMap)
  }

  private def tmpIndex(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString + "/idx"

  test("incremental report against the persisted index == batch cross-split dedup") {
    val path = tmpIndex("idx_eq")
    IncrementalDedup.writeShingleIndex(settled, path)
    val got = IncrementalDedup
      .reportFor(shard, IncrementalDedup.readShingleIndex(spark, path))
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    // from-scratch batch equivalent: all-pairs Jaccard over the full
    // corpus, restricted to (settled, shard) cross pairs — settled ids all
    // sort below shard ids, so doc_a is the settled side
    val batch = Dedup.ngramJaccardPairsFor(settled.unionByName(shard))
      .filter(col("doc_a") < 1000L && col("doc_b") >= 1000L)
      .groupBy(col("doc_b").as("doc_id"))
      .agg(max(col("jaccard")).as("max_jaccard"), count(lit(1)).as("n_matches"))
      .as[(Long, Double, Long)].collect().toSet
    assert(got == batch)
    assert(got.map(_._1) == (0L until 10L).map(_ + 1000L).toSet,
      "exactly the planted near-dups must be flagged")
  }

  test("the report's file scans read ONLY the index sink, never settled text") {
    val path = tmpIndex("idx_plan")
    IncrementalDedup.writeShingleIndex(settled, path)
    val report = IncrementalDedup
      .reportFor(shard, IncrementalDedup.readShingleIndex(spark, path))
    val plan = report.queryExecution.executedPlan.toString
    val locLines = plan.linesIterator.filter(_.contains("Location")).toSeq
    val idxName = new java.io.File(path).getName
    assert(locLines.nonEmpty, "expected parquet scans of the index sink")
    assert(locLines.forall(_.contains(idxName)),
      s"file scan outside the index sink:\n${locLines.mkString("\n")}")
  }

  test("ingest loop: admitted docs extend the index for the next tick") {
    val path = tmpIndex("idx_loop")
    IncrementalDedup.writeShingleIndex(settled, path)
    // tick 1: near-dups of settled docs rejected, fresh docs admitted
    val admitted1 = IncrementalDedup.ingestShard(shard, path)
    assert(admitted1.select("doc_id").as[Long].collect().toSet ==
      (0L until 10L).map(_ + 2000L).toSet)
    // tick 2: near-dups of tick-1 ADMITTED docs must now be rejected —
    // proof the append extended the index — while a genuinely new doc
    // (third disjoint vocabulary) still passes
    val rnd = new scala.util.Random(11)
    def newWord() = (0 until 5).map(_ => ('A' + rnd.nextInt(13)).toChar).mkString
    val dupsOfAdmitted = (0L until 5L).map { i =>
      val toks = freshTexts(i + 2000L).split(" ")
      toks(30) = "qqqqq"
      (i + 3000L) -> toks.mkString(" ")
    }
    val genuinelyNew =
      Seq(4000L -> (0 until 60).map(_ => newWord()).mkString(" "))
    val admitted2 = IncrementalDedup
      .ingestShard((dupsOfAdmitted ++ genuinelyNew).toDF("doc_id", "text"), path)
    assert(admitted2.select("doc_id").as[Long].collect().toSet == Set(4000L))
  }

  test("streaming ingest: each micro-batch dedups against the index grown by the last") {
    val path = tmpIndex("idx_stream")
    IncrementalDedup.writeShingleIndex(settled, path)
    val admittedPath = tmpIndex("admitted_sink")
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ingest_src").toString
    // stage each shard as ONE parquet file with a controlled mtime so the
    // file source delivers them as ordered micro-batches
    def addFile(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dst = new java.io.File(srcDir, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(mtime))
    }
    val rnd = new scala.util.Random(13)
    def newWord() = (0 until 5).map(_ => ('A' + rnd.nextInt(13)).toChar).mkString
    val dupsOfAdmitted = (0L until 5L).map { i =>
      val toks = freshTexts(i + 2000L).split(" ")
      toks(30) = "qqqqq"
      (i + 3000L) -> toks.mkString(" ")
    }
    val genuinelyNew =
      Seq(4000L -> (0 until 60).map(_ => newWord()).mkString(" "))
    val t0 = System.currentTimeMillis() - 60000
    addFile(shard, "b1.parquet", t0)
    addFile((dupsOfAdmitted ++ genuinelyNew).toDF("doc_id", "text"), "b2.parquet", t0 + 10000)
    val stream = spark.readStream.schema(settled.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = IncrementalDedup.streamingIngest(stream, path, admittedPath)
      .option("checkpointLocation",
        graft.sources.Sources.scratchDir(spark, "ingest_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, "ingest stream did not drain within 120s")
    // batch 1 admits the fresh docs (near-dups of settled rejected);
    // batch 2's near-dups of those admissions are rejected BY THE GROWN
    // INDEX, and only the genuinely new doc passes
    val admitted = spark.read.parquet(admittedPath)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == (0L until 10L).map(_ + 2000L).toSet + 4000L,
      s"got $admitted")
    // the index now carries exactly settled + admitted fingerprint owners
    val indexed = IncrementalDedup.readShingleIndex(spark, path)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(indexed == (0L until 30L).toSet ++ admitted)
  }

  test("incremental report equals a driver-side mirror on random dense-overlap corpora") {
    // randomized guard for pairsAgainstIndex (corpus-wide hotness over
    // index ∪ shard, cross-side core, per-doc aggregation) against a
    // plain Scala mirror — the DedupSpec random-corpus pattern pointed at
    // the persisted-index path
    val rnd = new scala.util.Random(17)
    def rnd4(x: Double) =
      BigDecimal.decimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until 3).foreach { trial =>
      val vocab = Vector.fill(12)((0 until 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      val docs = (0L until 30L).map(i =>
        i -> (0 until (5 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val (settledRows, shardRows) = docs.partition(_._1 % 3 != 0)
      val path = tmpIndex(s"idx_prop$trial")
      IncrementalDedup.writeShingleIndex(settledRows.toDF("doc_id", "text"), path)
      val got = IncrementalDedup.reportFor(shardRows.toDF("doc_id", "text"),
          IncrementalDedup.readShingleIndex(spark, path), threshold = 0.3, dfCap = 7)
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
      def shingles(t: String) = {
        val toks = t.split(" ", -1)
        if (toks.length < 3) Set.empty[String] else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (i, t) => i -> shingles(t) }.toMap
      val hotSh = sets.values.flatten.groupBy(identity)
        .collect { case (s, os) if os.size > 7 => s }.toSet
      val pairs = for {
        (a, _) <- shardRows
        (b, _) <- settledRows
        sa = sets(a); sb = sets(b)
        if ((sa & sb) -- hotSh).nonEmpty // candidacy: >=1 non-hot shared shingle
        inter = (sa & sb).size // Jaccard counts hot shingles too
        if inter >= 0.3 * sa.size && inter >= 0.3 * sb.size
        j = rnd4(inter.toDouble / (sa.size + sb.size - inter)) if j >= 0.3
      } yield a -> j
      val want = pairs.groupBy(_._1)
        .map { case (a, js) => a -> ((js.map(_._2).max, js.size.toLong)) }
      assert(got == want,
        s"trial $trial: only-got=${got.keySet -- want.keySet}, " +
          s"only-want=${want.keySet -- got.keySet}, " +
          s"value-diffs=${want.keySet.intersect(got.keySet).filter(k => got(k) != want(k))}")
    }
  }

  test("bucketed index: same report, no index-side Exchange in the candidate join") {
    val table = "graft_shidx_spec"
    IncrementalDedup.writeShingleIndexBucketed(settled, table, nBuckets = 4)
    val viaBucketed = IncrementalDedup.reportForBucketed(shard, table)
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    val path = tmpIndex("idx_vs_bucketed")
    IncrementalDedup.writeShingleIndex(settled, path)
    val viaPlain = IncrementalDedup
      .reportFor(shard, IncrementalDedup.readShingleIndex(spark, path))
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    assert(viaBucketed == viaPlain)
    // append maintenance: a second shard against the grown bucketed index
    // must collide with the first shard's docs
    IncrementalDedup.appendShingleIndexBucketed(
      shard.filter(col("doc_id") >= 2000L), table, nBuckets = 4)
    val dupOfAppended = Seq(5000L -> freshTexts(2001L))
      .toDF("doc_id", "text")
    val hit = IncrementalDedup.reportForBucketed(dupOfAppended, table)
      .select("doc_id").as[Long].collect().toSet
    assert(hit == Set(5000L), "appended docs must be visible to the next report")
    // the layout pin: the candidate sort-merge join on `shingle` reads
    // the bucketed index with NO Exchange under its index side (the shard
    // side shuffles into the index's bucketing)
    assertBucketedJoinShape(table)
  }

  /** Runs the bucketed report with broadcast disabled and pins the layout
    * contract: a single-key SMJ whose index side reads the bucketed
    * `_shingles` table with NO Exchange (the shard side shuffles into the
    * index's bucketing). Shared by the fresh-index and post-compaction
    * tests. */
  private def assertBucketedJoinShape(table: String): Unit =
    assertIndexJoinShape(IncrementalDedup.reportForBucketed(shard, table),
      "_shingles")

  /** The generalized layout pin: any report whose candidate SMJ streams a
    * bucketed index table (path containing `marker`) with NO Exchange
    * under the index side. */
  private def assertIndexJoinShape(build: => org.apache.spark.sql.DataFrame,
                                   marker: String): Unit = {
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = build
      df.collect()
      val exec = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      // descend through AQE stage wrappers (collect() stops at
      // QueryStageExec leaves) and reused exchanges
      import org.apache.spark.sql.execution.SparkPlan
      def kids(p: SparkPlan): Seq[SparkPlan] = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
        case _ => p.children
      }
      def all(p: SparkPlan): Iterator[SparkPlan] =
        Iterator.single(p) ++ kids(p).iterator.flatMap(all)
      def subtree(p: SparkPlan, pred: SparkPlan => Boolean): Boolean =
        all(p).exists(pred)
      def isIndexScan(p: SparkPlan): Boolean = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.exists(_.toString.contains(marker))
        case _ => false
      }
      def isShuffle(p: SparkPlan): Boolean =
        p.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike] ||
          p.isInstanceOf[org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec]
      val candidateJoins = all(exec).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.leftKeys.size == 1 && subtree(j.right, isIndexScan) => j
      }.toSeq
      assert(candidateJoins.nonEmpty,
        s"expected a single-key SMJ over the bucketed index:\n$exec")
      val shuffled = candidateJoins.filter(j => subtree(j.right, isShuffle))
      assert(shuffled.isEmpty,
        s"index side of the candidate join must not shuffle:\n${shuffled.headOption}")
      assert(subtree(exec, {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          isIndexScan(f) && f.bucketedScan
        case _ => false
      }), "the index scan must be a bucketed scan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("bucketed ingest loop: admitted docs extend the bucketed index for the next tick") {
    val table = "graft_shidx_loop_spec"
    IncrementalDedup.writeShingleIndexBucketed(settled, table, nBuckets = 4)
    val admitted1 = IncrementalDedup.ingestShardBucketed(shard, table, nBuckets = 4)
    assert(admitted1.select("doc_id").as[Long].collect().toSet ==
      (0L until 10L).map(_ + 2000L).toSet)
    val dupOfAdmitted = {
      val toks = freshTexts(2003L).split(" ")
      toks(30) = "qqqqq"
      Seq(6000L -> toks.mkString(" "))
    }.toDF("doc_id", "text")
    val admitted2 = IncrementalDedup.ingestShardBucketed(dupOfAdmitted, table, nBuckets = 4)
    assert(admitted2.count() == 0,
      "a near-dup of a tick-1 admission must be rejected by the grown bucketed index")
  }

  /** A shard of `n` fresh docs over a disjoint vocabulary drawn from
    * [charBase, charBase+13); returns the rows so tests can plant
    * near-dups of them. */
  private def freshDocs(seed: Int, charBase: Char, idBase: Long,
                        n: Int = 8): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    def word() = (0 until 5).map(_ => (charBase + rnd.nextInt(13)).toChar).mkString
    val vocab = Vector.fill(200)(word())
    (0L until n.toLong).map(i =>
      (idBase + i) -> (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
  }

  private def swapped(text: String, token: String = "wwwww"): String = {
    val toks = text.split(" ")
    toks(30) = token
    toks.mkString(" ")
  }

  test("compaction: one file per bucket, identical report, join shape intact") {
    val table = "graft_shidx_compact_spec"
    IncrementalDedup.writeShingleIndexBucketed(settled, table, nBuckets = 4)
    val tick2 = freshDocs(31, 'A', 7000L)
    val tick3 = freshDocs(37, 'N', 8000L)
    IncrementalDedup.ingestShardBucketed(shard, table, nBuckets = 4)
    IncrementalDedup.ingestShardBucketed(tick2.toDF("doc_id", "text"), table, nBuckets = 4)
    IncrementalDedup.ingestShardBucketed(tick3.toDF("doc_id", "text"), table, nBuckets = 4)
    // probe near-duplicates one doc from the settled corpus and one from
    // each tick's admissions: the report must see ALL of them, before and
    // after compaction
    val probe = Seq(
      9000L -> swapped(settled.filter(col("doc_id") === 0L)
        .select("text").as[String].head()),
      9001L -> swapped(freshTexts(2004L)),
      9002L -> swapped(tick2(1)._2),
      9003L -> swapped(tick3(2)._2)).toDF("doc_id", "text")
    def report() = IncrementalDedup.reportForBucketed(probe, table)
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    def dataFiles(name: String): Int = {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), name)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(wh).count(f => !f.getPath.getName.startsWith("_"))
    }
    val before = report()
    assert(before.map(_._1) == Set(9000L, 9001L, 9002L, 9003L),
      s"probe must hit settled + every tick's admissions: $before")
    val filesBefore = dataFiles(table + "_shingles")
    IncrementalDedup.compactShingleIndexBucketed(spark, table, nBuckets = 4)
    val filesAfter = dataFiles(table + "_shingles")
    // bootstrap + 3 appends each wrote a file set per bucket; the rewrite
    // repartitions onto the bucket hash so each bucket is exactly one file
    assert(filesAfter < filesBefore && filesAfter <= 4,
      s"expected <= 4 files after compaction, had $filesBefore, got $filesAfter")
    assert(report() == before, "compaction must not change the report")
    // the merged sizes sidecar stays one row per doc
    val dupSizes = spark.table(table + "_sizes")
      .groupBy(col("doc_id")).count().filter(col("count") > 1).count()
    assert(dupSizes == 0)
    // and the Exchange-free candidate-join layout survives the rename
    assertBucketedJoinShape(table)
    // crash window (r15 swapTableIn): simulate a failure BETWEEN the two
    // renames — the live names missing, the full stores under _retiring.
    // No data was lost (the old drop-first order deleted it here), and a
    // redo of the verb rolls back and converges to the same report.
    for (t <- Seq(table + "_shingles", table + "_sizes")) {
      spark.sql(s"ALTER TABLE $t RENAME TO ${t}_retiring")
      assert(!spark.catalog.tableExists(t))
    }
    IncrementalDedup.compactShingleIndexBucketed(spark, table, nBuckets = 4)
    assert(report() == before,
      "redo after a torn swap must converge to the pre-crash report")
    assert(!spark.catalog.tableExists(table + "_shingles_retiring"),
      "redo must clean up the retired copy")
    assertBucketedJoinShape(table)
  }

  test("XO compaction: folds committed batches; replay of a folded batch is a no-op") {
    val table = "graft_shidx_xoc_spec"
    val admPath = tmpIndex("xoc_adm")
    IncrementalDedup.writeShingleIndexBucketedXO(settled, table, nBuckets = 4)
    val adm0 = IncrementalDedup
      .ingestShardBucketedXO(shard, 0L, table, admPath, nBuckets = 4)
      .select("doc_id").as[Long].collect().toSet
    // batch 1 carries an intra-batch near-dup pair: both sides are
    // admitted (reports are shard-vs-index only), and the fold must not
    // turn them into mutual flags on replay
    val fresh1 = freshDocs(67, 'A', 7700L, n = 2)
    val b1 = (fresh1 :+ (7800L -> swapped(fresh1.head._2, "qqqqq")))
      .toDF("doc_id", "text")
    IncrementalDedup.ingestShardBucketedXO(b1, 1L, table, admPath, nBuckets = 4)
    def admSnap() = spark.read.parquet(admPath)
      .select("doc_id", "ingest_batch").as[(Long, Int)].collect().toSeq.sorted
    def idxContent() = spark.table(table + "_shingles")
      .select("doc_id", "shingle").as[(Long, String)].collect().toSeq.sorted
    def szContent() = spark.table(table + "_sizes")
      .select("doc_id", "n_shingles").as[(Long, Long)].collect().toSeq.sorted
    val probe = Seq(
      9100L -> swapped(settled.filter(col("doc_id") === 1L)
        .select("text").as[String].head()),
      9101L -> swapped(freshTexts(2006L)),
      9102L -> swapped(fresh1(1)._2)).toDF("doc_id", "text")
    def report() = IncrementalDedup.reportForBucketed(probe, table)
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    val admBefore = admSnap(); val idxBefore = idxContent()
    val szBefore = szContent(); val repBefore = report()
    assert(repBefore.map(_._1) == Set(9100L, 9101L, 9102L))
    IncrementalDedup.compactShingleIndexBucketedXO(spark, table, 1L, nBuckets = 4)
    assert(IncrementalDedup.settledWatermark(spark, table) == 1L)
    // content identical; layout folded to ONE partition at one file/bucket
    assert(idxContent() == idxBefore, "fold must not change the row set")
    assert(szContent() == szBefore, "fold must not change the sizes sidecar")
    assert(report() == repBefore, "fold must not change the report")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table + "_shingles")).location)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(loc).map(_.getPath.getName)
      .filter(_.startsWith("ingest_batch=")).toSet
    assert(parts == Set("ingest_batch=-1"),
      s"batches <= watermark must fold into the settled partition: $parts")
    val settledFiles = fs.listStatus(
      new org.apache.hadoop.fs.Path(loc, "ingest_batch=-1"))
      .count(f => !f.getPath.getName.startsWith("_"))
    assert(settledFiles <= 4, s"expected one file per bucket, got $settledFiles")
    // replay of the FOLDED batches: watermark-guard no-ops returning the
    // persisted admissions — nothing recomputed, nothing re-appended
    val replay0 = IncrementalDedup
      .ingestShardBucketedXO(shard, 0L, table, admPath, nBuckets = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(replay0 == adm0, "folded-batch replay must return the persisted admissions")
    val replay1 = IncrementalDedup
      .ingestShardBucketedXO(b1, 1L, table, admPath, nBuckets = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(replay1 == Set(7700L, 7701L, 7800L),
      "intra-batch co-admissions must survive a folded-batch replay")
    assert(admSnap() == admBefore && idxContent() == idxBefore,
      "folded-batch replay must not touch either sink")
    // a LATER batch still ingests normally against the folded index: a
    // near-dup of a folded batch-1 admission is rejected, fresh passes
    val b2 = (freshDocs(71, 'N', 7900L, n = 1) :+
      (7950L -> swapped(fresh1(1)._2, "rrrrr"))).toDF("doc_id", "text")
    val adm2 = IncrementalDedup
      .ingestShardBucketedXO(b2, 2L, table, admPath, nBuckets = 4)
      .select("doc_id").as[Long].collect().toSet
    assert(adm2 == Set(7900L), s"expected only the fresh doc admitted: $adm2")
    // the watermark is monotonic
    intercept[IllegalArgumentException] {
      IncrementalDedup.compactShingleIndexBucketedXO(spark, table, 0L, nBuckets = 4)
    }
    // and the bucket-aligned candidate join survives the fold
    assertBucketedJoinShape(table)
  }

  test("fingerprint-index report == plain-shingle-index report on the planted corpus") {
    val fpPath = tmpIndex("fp_eq")
    IncrementalDedup.writeFpIndex(settled, fpPath)
    val viaFp = IncrementalDedup.reportForFpIndex(shard,
        IncrementalDedup.readShingleIndex(spark, fpPath), settled)
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    val shPath = tmpIndex("sh_vs_fp")
    IncrementalDedup.writeShingleIndex(settled, shPath)
    val viaSh = IncrementalDedup.reportFor(shard,
        IncrementalDedup.readShingleIndex(spark, shPath))
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    assert(viaFp == viaSh,
      s"only-fp=${viaFp -- viaSh}, only-sh=${viaSh -- viaFp}")
  }

  test("winnowed ingest loop: admissions extend the fp index AND the corpus store") {
    val fpPath = tmpIndex("fp_loop")
    val corpusPath = tmpIndex("fp_corpus")
    settled.write.mode("overwrite").parquet(corpusPath)
    IncrementalDedup.writeFpIndex(settled, fpPath)
    val admitted1 = IncrementalDedup.ingestShardWinnowed(shard, fpPath, corpusPath)
    assert(admitted1.select("doc_id").as[Long].collect().toSet ==
      (0L until 10L).map(_ + 2000L).toSet)
    // tick 2: a near-dup of a tick-1 admission must be rejected — its
    // fingerprints are in the index and its TEXT is in the corpus store
    // for the exact re-score; a genuinely new doc still passes
    val tick2 = (freshDocs(41, 'A', 9100L, n = 1) :+
      (9200L -> swapped(freshTexts(2002L), "qqqqq"))).toDF("doc_id", "text")
    val admitted2 = IncrementalDedup.ingestShardWinnowed(tick2, fpPath, corpusPath)
    assert(admitted2.select("doc_id").as[Long].collect().toSet == Set(9100L))
  }

  test("bucketed fp index: same report as the plain fp index, join bucket-aligned") {
    val table = "graft_fpidx_spec"
    IncrementalDedup.writeFpIndexBucketed(settled, table, nBuckets = 4)
    val viaBucketed = IncrementalDedup
      .reportForFpIndexBucketed(shard, table, settled)
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    val fpPath = tmpIndex("fp_vs_bucketed")
    IncrementalDedup.writeFpIndex(settled, fpPath)
    val viaPlain = IncrementalDedup.reportForFpIndex(shard,
        IncrementalDedup.readShingleIndex(spark, fpPath), settled)
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    assert(viaBucketed == viaPlain,
      s"only-bk=${viaBucketed -- viaPlain}, only-plain=${viaPlain -- viaBucketed}")
    assertIndexJoinShape(
      IncrementalDedup.fpCandidatesBucketed(shard, table), "_fps")
  }

  test("bucketed winnowed loop: admissions extend index+corpus; compaction shrinks files only") {
    val table = "graft_fpidx_loop_spec"
    val corpusPath = tmpIndex("fp_bk_corpus")
    settled.write.mode("overwrite").parquet(corpusPath)
    IncrementalDedup.writeFpIndexBucketed(settled, table, nBuckets = 4)
    val admitted1 = IncrementalDedup
      .ingestShardWinnowedBucketed(shard, table, corpusPath, nBuckets = 4)
    assert(admitted1.select("doc_id").as[Long].collect().toSet ==
      (0L until 10L).map(_ + 2000L).toSet)
    // tick 2: near-dup of a tick-1 admission rejected (its fps are in the
    // bucketed index, its text in the corpus store); a fresh doc passes
    val tick2 = (freshDocs(43, 'A', 9300L, n = 1) :+
      (9400L -> swapped(freshTexts(2007L), "qqqqq"))).toDF("doc_id", "text")
    val admitted2 = IncrementalDedup
      .ingestShardWinnowedBucketed(tick2, table, corpusPath, nBuckets = 4)
    assert(admitted2.select("doc_id").as[Long].collect().toSet == Set(9300L))
    // compaction: fewer files, identical report, layout pin intact
    def dataFiles(): Int = {
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table + "_fps")
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(wh).count(f => !f.getPath.getName.startsWith("_"))
    }
    val probe = Seq(
      9500L -> swapped(settled.filter(col("doc_id") === 2L)
        .select("text").as[String].head()),
      9501L -> swapped(freshTexts(2008L)),
      9502L -> swapped(tick2.filter(col("doc_id") === 9300L)
        .select("text").as[String].head())).toDF("doc_id", "text")
    def report() = IncrementalDedup
      .reportForFpIndexBucketed(probe, table, spark.read.parquet(corpusPath))
      .select("doc_id", "max_jaccard", "n_matches")
      .as[(Long, Double, Long)].collect().toSet
    val before = report()
    assert(before.map(_._1) == Set(9500L, 9501L, 9502L),
      s"probe must hit settled + both ticks' admissions: $before")
    val filesBefore = dataFiles()
    IncrementalDedup.compactFpIndexBucketed(spark, table, nBuckets = 4)
    val filesAfter = dataFiles()
    assert(filesAfter < filesBefore && filesAfter <= 4,
      s"expected <= 4 files after compaction, had $filesBefore, got $filesAfter")
    assert(report() == before, "compaction must not change the report")
    assertIndexJoinShape(
      IncrementalDedup.fpCandidatesBucketed(probe, table), "_fps")
  }

  test("winnowed index density: ~2/(w+1) of the k-gram count; rows tunable by w") {
    val nKgrams = settled.select(sum(greatest(length(col("text")) - 15, lit(0))))
      .as[Long].head()
    val nFp8 = Dedup.winnowingFingerprints(settled, k = 16, w = 8).count()
    val nFp32 = Dedup.winnowingFingerprints(settled, k = 16, w = 32).count()
    val nSh = Dedup.docShingles(settled).count()
    // winnowing theory: expected density 2/(w+1) of k-gram positions
    // (distinct-set dedup shaves a little)
    val d8 = nFp8.toDouble / nKgrams
    assert(d8 > 1.4 / 9 && d8 < 2.6 / 9, s"w=8 density $d8 outside band")
    // the honest size relation this index REPLACES the shingle index
    // under: at k=16/w=8 on ~6-char tokens there are MORE fp rows than
    // 3-token-shingle rows (density is per CHARACTER k-gram); the row
    // count shrinks ∝ 1/(w+1), so w=32 is genuinely smaller
    assert(nFp8 > nSh, s"expected fp rows ($nFp8) > shingle rows ($nSh) at w=8")
    assert(nFp32 < nSh, s"expected fp rows ($nFp32) < shingle rows ($nSh) at w=32")
    assert(nFp32 < nFp8 / 2.5, s"w=32 must cut w=8's rows ~3.7x: $nFp32 vs $nFp8")
  }

  test("multi-tick report equals a cumulative driver-side mirror on random corpora") {
    val rnd = new scala.util.Random(29)
    def rnd4(x: Double) =
      BigDecimal.decimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until 2).foreach { trial =>
      val vocab = Vector.fill(12)((0 until 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString)
      val docs = (0L until 36L).map(i =>
        i -> (0 until (5 + rnd.nextInt(20))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val settledRows = docs.filter(_._1 % 4 == 3)
      val shardRows = (0 to 2).map(t => docs.filter(_._1 % 4 == t))
      val path = tmpIndex(s"idx_mt$trial")
      IncrementalDedup.writeShingleIndex(settledRows.toDF("doc_id", "text"), path)
      val got = IncrementalDedup.multiTickReport(
          shardRows.map(_.toDF("doc_id", "text")), path, threshold = 0.3, dfCap = 7)
        .collect()
        .map(r => (r.getLong(0), r.getInt(3)) -> ((r.getDouble(1), r.getLong(2))))
        .toMap
      def shingles(t: String) = {
        val toks = t.split(" ", -1)
        if (toks.length < 3) Set.empty[String] else toks.sliding(3).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (i, t) => i -> shingles(t) }.toMap
      var idx = settledRows.map(_._1).toSet
      val want = scala.collection.mutable.Map.empty[(Long, Int), (Double, Long)]
      for (t <- 0 to 2) {
        val shardIds = shardRows(t).map(_._1)
        // hotness is per-tick corpus-wide: df over index ∪ THIS shard
        val hotSh = (idx ++ shardIds).toSeq.flatMap(sets)
          .groupBy(identity).collect { case (s, os) if os.size > 7 => s }.toSet
        val js = for {
          a <- shardIds
          b <- idx.toSeq
          sa = sets(a); sb = sets(b)
          if ((sa & sb) -- hotSh).nonEmpty
          inter = (sa & sb).size
          if inter >= 0.3 * sa.size && inter >= 0.3 * sb.size
          j = rnd4(inter.toDouble / (sa.size + sb.size - inter)) if j >= 0.3
        } yield a -> j
        js.groupBy(_._1).foreach { case (a, hits) =>
          want((a, t)) = (hits.map(_._2).max, hits.size.toLong)
        }
        idx ++= shardIds.filterNot(js.map(_._1).toSet)
      }
      assert(got == want.toMap,
        s"trial $trial: only-got=${got.keySet -- want.keySet}, " +
          s"only-want=${want.keySet -- got.keySet}, " +
          s"diffs=${want.keySet.intersect(got.keySet).filter(k => got(k) != want(k))}")
    }
  }

  test("exactly-once ingest: a replayed batch reproduces both sinks byte for byte") {
    val idxPath = tmpIndex("xo_idx")
    val admPath = tmpIndex("xo_adm")
    IncrementalDedup.writeShingleIndexPartitioned(settled, idxPath)
    val admitted0 = IncrementalDedup.ingestShardIdempotent(shard, 0L, idxPath, admPath)
    assert(admitted0.select("doc_id").as[Long].collect().toSet ==
      (0L until 10L).map(_ + 2000L).toSet)
    // batch 1: an intra-batch near-dup pair (BOTH admitted — the settled-
    // corpus-first contract never checks a shard against itself), a
    // near-dup of a batch-0 admission (rejected), and a fresh doc
    val fresh1 = freshDocs(43, 'A', 5000L, n = 2)
    val b1 = (fresh1 :+ (5100L -> swapped(fresh1.head._2, "qqqqq")) :+
      (5200L -> swapped(freshTexts(2003L), "qqqqq"))).toDF("doc_id", "text")
    val admitted1 = IncrementalDedup.ingestShardIdempotent(b1, 1L, idxPath, admPath)
    assert(admitted1.select("doc_id").as[Long].collect().toSet ==
      Set(5000L, 5001L, 5100L))
    def admSnap() = spark.read.parquet(admPath)
      .select("doc_id", "ingest_batch").as[(Long, Int)].collect().toSeq.sorted
    def idxSnap() = spark.read.parquet(idxPath)
      .select("doc_id", "shingle", "ingest_batch").as[(Long, String, Int)]
      .collect().toSeq.sorted
    val adm1 = admSnap()
    val idx1 = idxSnap()
    // worst-case replay: the first attempt persisted EVERYTHING (index
    // partition + admitted partition) before the checkpoint commit was
    // lost. The at-least-once loop would now reject 5100 (its twin 5000
    // is indexed) and duplicate every admitted row; the idempotent form
    // must reproduce the no-failure state exactly.
    IncrementalDedup.ingestShardIdempotent(b1, 1L, idxPath, admPath)
    assert(admSnap() == adm1, "admitted sink changed under replay")
    assert(idxSnap() == idx1, "index changed under replay")
  }

  test("exactly-once streaming ingest drains like the batch loop") {
    val idxPath = tmpIndex("xo_stream_idx")
    val admPath = tmpIndex("xo_stream_adm")
    IncrementalDedup.writeShingleIndexPartitioned(settled, idxPath)
    val srcDir = java.nio.file.Files.createTempDirectory("graft_xo_src").toString
    def addFile(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_xo_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      val dst = new java.io.File(srcDir, name)
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(mtime))
    }
    val dupOfAdmitted = (0L until 3L).map { i =>
      (i + 6000L) -> swapped(freshTexts(i + 2000L), "qqqqq")
    }
    val genuinelyNew = freshDocs(47, 'N', 6500L, n = 1)
    val t0 = System.currentTimeMillis() - 60000
    addFile(shard, "b1.parquet", t0)
    addFile((dupOfAdmitted ++ genuinelyNew).toDF("doc_id", "text"), "b2.parquet", t0 + 10000)
    val stream = spark.readStream.schema(settled.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = IncrementalDedup.streamingIngestExactlyOnce(stream, idxPath, admPath)
      .option("checkpointLocation",
        graft.sources.Sources.scratchDir(spark, "xo_ingest_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(!q.isActive, "exactly-once ingest stream did not drain within 120s")
    val admitted = spark.read.parquet(admPath)
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == (0L until 10L).map(_ + 2000L).toSet + 6500L, s"got $admitted")
  }

  test("bucketed exactly-once: replay reproduces sinks, join stays bucket-aligned") {
    val table = "graft_shidx_xo_spec"
    val admPath = tmpIndex("xo_bk_adm")
    IncrementalDedup.writeShingleIndexBucketedXO(settled, table, nBuckets = 4)
    val admitted0 = IncrementalDedup
      .ingestShardBucketedXO(shard, 0L, table, admPath, nBuckets = 4)
    assert(admitted0.select("doc_id").as[Long].collect().toSet ==
      (0L until 10L).map(_ + 2000L).toSet)
    // batch 1: intra-batch near-dup pair (both admitted), a near-dup of a
    // batch-0 admission (rejected), and a fresh doc — same plant as the
    // plain exactly-once test
    val fresh1 = freshDocs(53, 'A', 5300L, n = 2)
    val b1 = (fresh1 :+ (5400L -> swapped(fresh1.head._2, "qqqqq")) :+
      (5500L -> swapped(freshTexts(2005L), "qqqqq"))).toDF("doc_id", "text")
    val admitted1 = IncrementalDedup
      .ingestShardBucketedXO(b1, 1L, table, admPath, nBuckets = 4)
    assert(admitted1.select("doc_id").as[Long].collect().toSet ==
      Set(5300L, 5301L, 5400L))
    def admSnap() = spark.read.parquet(admPath)
      .select("doc_id", "ingest_batch").as[(Long, Int)].collect().toSeq.sorted
    def idxSnap() = spark.table(table + "_shingles")
      .select("doc_id", "shingle", "ingest_batch").as[(Long, String, Long)]
      .collect().toSeq.sorted
    val adm1 = admSnap(); val idx1 = idxSnap()
    // worst-case replay of batch 1: everything already persisted
    IncrementalDedup.ingestShardBucketedXO(b1, 1L, table, admPath, nBuckets = 4)
    assert(admSnap() == adm1, "admitted sink changed under replay")
    assert(idxSnap() == idx1, "bucketed index changed under replay")
    // partial-failure compensation: plant garbage in batch 2's partition
    // (as a crashed attempt would leave) — the tick must sweep it and
    // produce exactly what a clean batch-2 run produces
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table + "_shingles")).location)
    val orphanDir = new org.apache.hadoop.fs.Path(loc, "ingest_batch=2")
    val fs = orphanDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(999999L -> "orphan shingle row from a crashed attempt")
      .toDF("doc_id", "shingle").coalesce(1)
      .write.mode("overwrite").parquet(orphanDir.toString)
    spark.catalog.refreshTable(table + "_shingles")
    val b2 = freshDocs(59, 'N', 5600L, n = 1).toDF("doc_id", "text")
    val admitted2 = IncrementalDedup
      .ingestShardBucketedXO(b2, 2L, table, admPath, nBuckets = 4)
    assert(admitted2.select("doc_id").as[Long].collect().toSet == Set(5600L))
    assert(spark.table(table + "_shingles")
      .filter(col("doc_id") === 999999L).count() == 0,
      "compensation must sweep a crashed attempt's partition")
    // and the composed layout keeps the bucket-aligned candidate join
    assertBucketedJoinShape(table)
  }

  test("the same verb serves a winnowed-fingerprint index") {
    val path = tmpIndex("idx_winnow")
    Dedup.winnowingFingerprints(settled).withColumnRenamed("fp", "shingle")
      .write.mode("overwrite").parquet(path)
    val shNew = Dedup.winnowingFingerprints(shard)
      .withColumnRenamed("fp", "shingle").localCheckpoint(true)
    val pairs = IncrementalDedup
      .pairsAgainstIndex(shNew, IncrementalDedup.readShingleIndex(spark, path))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every planted near-dup (one token swapped mid-document) shares long
    // unchanged runs >= k+w-1 chars, so the winnowed sets overlap heavily
    val wanted = (0L until 10L).map(i => (i + 1000L, i)).toSet
    assert(wanted.subsetOf(pairs), s"missed: ${wanted -- pairs}")
  }

  test("q117 incremental novelty: persisted-index scores == in-session shingle sets") {
    val got = IncrementalDedup.incrementalNoveltyReport(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def sh(text: String): Set[String] = {
      val t = text.split(" ", -1)
      if (t.length < 3) Set.empty else t.sliding(3).map(_.mkString(" ")).toSet
    }
    val ref = docs.filter(_._1 % 7 != 0).flatMap(d => sh(d._2)).toSet
    val shard = docs.filter(_._1 % 7 == 0)
    assert(shard.nonEmpty)
    shard.foreach { case (id, text) =>
      val s = sh(text)
      if (s.isEmpty) assert(!got.contains(id))
      else {
        val seen = s.count(ref.contains)
        val (_, n, gSeen, nov) = got(id)
        assert(n == s.size.toLong && gSeen == seen.toLong, s"doc $id counts")
        val want = BigDecimal(1.0 - seen.toDouble / s.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(nov - want) <= 1e-9, s"doc $id novelty")
      }
    }
  }

  test("q142 chunk-grain incremental dedup: copies and shifted copies rejected, fresh admitted") {
    val base = graft.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .maxBy(_._2.split(" ").length)._2
    val fresh = (1 to 40).map(i => s"fresh$i").mkString(" ")
    val settled = Seq((1L, base), (2L, fresh)).toDF("doc_id", "text")
    val idxPath = java.nio.file.Files
      .createTempDirectory("chunkidx-spec").toString
    IncrementalDedup.writeChunkHashIndex(settled, idxPath)
    val shard = Seq(
      (101L, base),                                    // exact copy
      (102L, "zzz " + base),                           // shifted copy
      (103L, (1 to 40).map(i => s"new$i").mkString(" "))) // genuinely new
      .toDF("doc_id", "text")
    val rep = IncrementalDedup.chunkDedupReportFor(shard,
        spark.read.parquet(idxPath))
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rep(101L)._6, "exact copy must be dropped")
    assert(rep(101L)._3 == rep(101L)._2, "every chunk of the copy is settled")
    assert(rep(102L)._6, "shifted copy must be dropped (CDC resync)")
    assert(rep(102L)._3 < rep(102L)._2, "only the head region is novel")
    assert(!rep(103L)._6 && rep(103L)._3 == 0L, "fresh doc admitted, no settled chunks")
    // a probe at a different chunking seed must not silently match (the
    // width/seed-threading lesson): everything reads fully novel
    val wrongSeed = IncrementalDedup.chunkDedupReportFor(shard,
        spark.read.parquet(idxPath), seed = 7L)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(wrongSeed.forall(r => r._3 == 0L),
      "cross-seed probe matches nothing — callers must thread one seed")
    // fixture entry: gate arithmetic consistent with the profile
    val fx = IncrementalDedup.chunkIncrementalDedupReport(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(fx.nonEmpty)
    fx.foreach { r =>
      val frac = BigDecimal(r._4.toDouble / r._5)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r._6 == (frac >= 0.5), s"doc ${r._1} gate")
    }
    // the ingest loop: tick 1 admits the novel doc and extends the sink,
    // so tick 2 rejects a copy of what tick 1 admitted
    val novel = (1 to 40).map(i => s"loop$i").mkString(" ")
    val t1 = IncrementalDedup.chunkIngestShard(
      Seq((201L, novel)).toDF("doc_id", "text"), idxPath)
    assert(t1.select(col("doc_id")).as[Long].collect().toSeq == Seq(201L))
    val t2 = IncrementalDedup.chunkIngestShard(
      Seq((202L, novel), (203L, (1 to 40).map(i => s"other$i").mkString(" ")))
        .toDF("doc_id", "text"), idxPath)
    assert(t2.select(col("doc_id")).as[Long].collect().toSet == Set(203L),
      "a copy of a prior admission must be rejected by the extended sink")
  }

  test("parameter sidecar: mismatched-width/geometry/seed probes fail loudly") {
    // shingle index: written at n=3, probed/appended at n=2 → loud failure,
    // never the silent ~100% bogus novelty a matching-nothing join returns
    val shPath = tmpIndex("meta_sh")
    IncrementalDedup.writeShingleIndex(settled, shPath, n = 3)
    val e1 = intercept[IllegalArgumentException] {
      IncrementalDedup.appendShingleIndex(shard, shPath, n = 2)
    }
    assert(e1.getMessage.contains("n=3") && e1.getMessage.contains("n=2"))
    intercept[IllegalArgumentException] {
      IncrementalDedup.noveltyAgainstIndex(shard, shPath, n = 2)
    }
    // matching parameters pass, and the probe still works after appends
    IncrementalDedup.appendShingleIndex(shard, shPath, n = 3)
    assert(IncrementalDedup.noveltyAgainstIndex(settled.limit(2), shPath, n = 3)
      .count() > 0L)
    // rebuilding at a new width re-stamps the sidecar: the new width is
    // now the valid one and the OLD width is the mismatch
    IncrementalDedup.writeShingleIndex(settled, shPath, n = 2)
    IncrementalDedup.appendShingleIndex(shard, shPath, n = 2)
    intercept[IllegalArgumentException] {
      IncrementalDedup.appendShingleIndex(shard, shPath, n = 3)
    }
    // fingerprint index: (k, w) geometry is recorded and enforced
    val fpPath = tmpIndex("meta_fp")
    IncrementalDedup.writeFpIndex(settled, fpPath, k = 16, w = 8)
    intercept[IllegalArgumentException] {
      IncrementalDedup.appendFpIndex(shard, fpPath, k = 16, w = 4)
    }
    intercept[IllegalArgumentException] {
      IncrementalDedup.ingestShardWinnowed(shard, fpPath,
        tmpIndex("meta_corpus"), k = 12, w = 8)
    }
    // chunk-hash index: the CDC seed is recorded and enforced
    val chPath = tmpIndex("meta_chunk")
    IncrementalDedup.writeChunkHashIndex(settled, chPath, seed = 42L)
    intercept[IllegalArgumentException] {
      IncrementalDedup.chunkIngestShard(shard, chPath, seed = 7L)
    }
    // bucketed table index: the sidecar lives in the table dir and
    // survives compaction's directory move
    val table = "graft_meta_spec_" +
      java.lang.Long.toHexString(System.nanoTime())
    IncrementalDedup.writeShingleIndexBucketed(settled, table, nBuckets = 4)
    IncrementalDedup.appendShingleIndexBucketed(shard, table, nBuckets = 4)
    IncrementalDedup.compactShingleIndexBucketed(spark, table, nBuckets = 4)
    // post-compaction: the re-stamped sidecar still validates probes
    assert(IncrementalDedup.reportForBucketed(shard, table).count() > 0L)
  }

  test("q168 index staleness: coverage replays the split + the too-short-to-shingle class") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    val want = docs.groupBy(_._2).map { case (src, rows) =>
      val idx = rows.count(r => r._1 % 7 != 0 && r._3.split(" ", -1).length >= 3)
      src -> ((rows.length.toLong, idx.toLong))
    }
    val got = IncrementalDedup.indexStalenessAudit(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (src, (n, idx)) =>
      val (gn, gidx, gun, cov) = got(src)
      assert((gn, gidx, gun) == ((n, idx, n - idx)), s"source $src")
      val r6 = BigDecimal(idx.toDouble / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cov == r6, s"source $src coverage")
    }
    // a settled doc too short to shingle must read as uncovered — the
    // class a naive split-count staleness check misses
    val dir = java.nio.file.Files.createTempDirectory("graft_stale").toString
    Seq((1L, "a b c d", "en", "s0", 7L), (2L, "ab", "en", "s0", 2L),
        (7L, "x y z w", "en", "s0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tiny = IncrementalDedup.indexStalenessAudit(spark, dir)
      .as[(String, Long, Long, Long, Double)].head()
    // doc 1 indexed; doc 2 settled but shingle-less; doc 7 is the new split
    assert(tiny == (("s0", 3L, 1L, 2L, 0.333333)), s"got $tiny")
  }
}