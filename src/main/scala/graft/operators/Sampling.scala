package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling & partitioning (SURVEY §2.5 D2–D5) — the reference's signature
  * operators: stratified sampleBy, seeded randomSplit, hash repartition,
  * partition introspection.
  *
  * The RNG-dependent row sets are Spark-internal, so these queries expose
  * *invariants* with constant oracles (SURVEY §5.2 item 2 / §7.4 item 1)
  * rather than row-level results: violation counts that must be zero, and
  * structural facts (partition counts) that must be exact.
  */
object Sampling {

  /** Eagerly compute a tiny (invariant-style) result so the caller can
    * unpersist its caches before returning: the invariant queries cache a
    * key projection that feeds several sample branches, and handing back a
    * lazy plan would leak that cache into long-lived library sessions
    * (bench clears caches between queries; a user's session doesn't).
    * Only ever used on ≤-a-few-rows aggregates — never a data-sized
    * collect.
    */
  private def materialized(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** D2 — stratified sample (reference
    * /root/reference/src/preprocessing_pipeline.py:173-176: sampleBy on the
    * stratification key with per-label fractions, seed 42). Stratification
    * key here: l_returnflag.
    */
  def stratifiedSample(spark: SparkSession, dir: String,
                       fractions: Map[String, Double] = Map("A" -> 0.1, "N" -> 0.2, "R" -> 0.3),
                       seed: Long = 42L): DataFrame =
    Tables.lineitem(spark, dir).stat.sampleBy("l_returnflag", fractions, seed)

  /** D2 invariant — per-stratum observed/expected fraction within ±20%
    * (binomial tolerance; expected counts are thousands at sf0.01).
    * Output: one row, violations = 0.
    */
  def sampleByInvariant(spark: SparkSession, dir: String): DataFrame = {
    val fractions = Map("A" -> 0.1, "N" -> 0.2, "R" -> 0.3)
    val li = Tables.lineitem(spark, dir)
    val totals = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("total"))
    val sampled = stratifiedSample(spark, dir, fractions)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("got"))
    val fracCol = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col("l_returnflag") === k, lit(v)).otherwise(acc)
    }
    totals.join(sampled, Seq("l_returnflag"), "left")
      .withColumn("expected", col("total") * fracCol)
      .withColumn("violation",
        when(abs(coalesce(col("got"), lit(0L)) - col("expected")) > col("expected") * 0.2, 1)
          .otherwise(0))
      .agg(sum(col("violation")).cast("long").as("violations"))
  }

  /** D2-skew — the reference's non-IID client partitioning
    * (/root/reference/src/preprocessing_pipeline.py:209-240,
    * partition_data_with_skew / partition_data_spark): each client draws
    * an independent stratified sample from the SAME parent with its own
    * per-label fractions (overlap between clients is part of the
    * reference's semantics; the same seed makes the draws nested). The
    * reference recomputes the label universe with distinct().collect()
    * inside the client loop (SURVEY §4.2 item 3); here fractions are
    * declared per client and Spark's sampleBy treats absent labels as 0,
    * so no driver round-trip is needed at all.
    */
  def skewedClientPartitions(df: DataFrame, labelCol: String,
                             clientFractions: Seq[Map[String, Double]],
                             seed: Long = 42L): Seq[DataFrame] =
    clientFractions.map(f => df.stat.sampleBy(labelCol, f, seed))

  /** D2-skew invariant — per (client, label) observed counts within ±20%
    * of fraction × label total. Output: one row, violations = 0. */
  def skewedSplitInvariant(spark: SparkSession, dir: String): DataFrame = {
    val clientFractions = Seq(
      Map("A" -> 0.6, "N" -> 0.1, "R" -> 0.1),
      Map("A" -> 0.1, "N" -> 0.6, "R" -> 0.1),
      Map("A" -> 0.1, "N" -> 0.1, "R" -> 0.6))
    // eagerly localCheckpointed, not cache()d: the branches must all read
    // the SAME materialized rows (sampleBy re-evaluates its source), and a
    // cache entry would outlive the query in a long-lived session
    val keyed = Tables.lineitem(spark, dir).select(col("l_returnflag"))
      .localCheckpoint(true)
    val totals = keyed.groupBy(col("l_returnflag")).agg(count(lit(1)).as("total"))
    val observed = skewedClientPartitions(keyed, "l_returnflag", clientFractions)
      .zipWithIndex
      .map { case (df, i) =>
        df.groupBy(col("l_returnflag")).agg(count(lit(1)).as("got"))
          .withColumn("client", lit(i))
      }
      .reduce(_.unionByName(_))
    val fracCol = clientFractions.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (fracs, i)) =>
        fracs.foldLeft(acc) { case (a, (label, f)) =>
          when(col("client") === i && col("l_returnflag") === label, lit(f)).otherwise(a)
        }
    }
    val result = observed.join(totals, "l_returnflag")
      .withColumn("expected", col("total") * fracCol)
      .withColumn("violation",
        when(abs(col("got") - col("expected")) > col("expected") * 0.2, 1).otherwise(0))
      .agg(sum(col("violation")).cast("long").as("violations"))
    try materialized(result) finally keyed.unpersist()
  }

  /** D3 — seeded random split into n disjoint clients (reference
    * /root/reference/src/preprocessing_pipeline.py:197-199). Spark sorts
    * within partitions before assigning, so the split is deterministic for
    * a given seed + input.
    */
  def randomClientSplit(df: DataFrame, n: Int, seed: Long = 42L): Array[DataFrame] =
    df.randomSplit(Array.fill(n)(1.0 / n), seed)

  /** D3 invariant — engine form of the reference's verify_unique_split
    * (/root/reference/utils/preprocessing_testing_utils.py:60-80, executed
    * there as driver-side Python set intersection; here as distributed
    * semi-join/intersect counts, SURVEY §2.3 J1):
    * pairwise overlap rows = 0 and Σ split sizes − parent size = 0.
    */
  def randomSplitInvariant(spark: SparkSession, dir: String): DataFrame = {
    // o_orderkey is unique in orders, so a key appearing in two splits is
    // exactly a pairwise overlap. Tag each split branch with its id, union,
    // and check both invariants in ONE aggregation over the cached input —
    // vs the naive n²/2 intersect jobs + n count jobs, each of which would
    // rescan (and at 100 TB, re-shuffle) the parent.
    // localCheckpoint(true), not cache(): pins one materialization for all
    // split branches (randomSplit determinism) without a session-lifetime
    // cacheManager entry
    val keyed = Tables.orders(spark, dir).select(col("o_orderkey"))
      .localCheckpoint(true)
    val parentCount = keyed.count()
    val tagged = randomClientSplit(keyed, 4).zipWithIndex
      .map { case (df, i) => df.withColumn("split_id", lit(i)) }
      .reduce(_.unionByName(_))
    val result = tagged
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_assignments"))
      .agg(
        sum(when(col("n_assignments") > 1, 1L).otherwise(0L)).cast("long").as("overlap_rows"),
        (sum(col("n_assignments")) - parentCount).cast("long").as("count_diff"))
    try materialized(result) finally keyed.unpersist()
  }

  /** q86 — DETERMINISTIC GLOBAL SHUFFLE: the "shuffle the corpus before
    * training" step, reproducible from a seed. Each doc's shuffle key is
    * md5(doc_id:seed) — uniform, engine-independent, and stable across
    * runs — and the output is the doc's POSITION in that order (the record
    * a training loader seeks by).
    *
    * A single `row_number over (order by key)` is a one-partition sort at
    * 100 TB, so the rank is computed distributed (the q84 two-level shape):
    * the first `prefixChars` hex chars of the key split the corpus into
    * 16^prefixChars uniform buckets, per-bucket counts prefix-sum over a
    * bucket-count-sized relation (the only unpartitioned window — bounded
    * by construction), and each doc's position is its bucket's prefix plus
    * an in-bucket row_number. Every corpus-sized stage hash-partitions;
    * this is exactly how a range partitioner assigns global ranks, spelled
    * out so the bucket→prefix mechanics are testable against the
    * single-window oracle.
    *
    * `prefixChars` sizes the fan-out to the corpus: 2 (256 buckets) for
    * fixture scale, 3–4 (4k–64k buckets) at the 100 TB target so each
    * in-bucket sort task holds GBs, not hundreds of GBs. The permutation is
    * IDENTICAL at every width — buckets are key prefixes, so concatenating
    * buckets in bucket order IS the total key order — which the spec pins
    * by running two widths against the same oracle.
    */
  def globalShuffleRank(spark: SparkSession, dir: String, seed: Long = 42L,
                        prefixChars: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(prefixChars >= 1 && prefixChars <= 8, s"prefixChars out of range: $prefixChars")
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(s":$seed"))).as("shuffle_key"))
      .withColumn("bucket", substring(col("shuffle_key"), 1, prefixChars))
    val bucketPrefix = keyed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_prefix",
        coalesce(sum(col("n")).over(
          Window.orderBy(col("bucket")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("bucket_prefix"))
    val inBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("shuffle_key"), col("doc_id"))
    keyed
      .withColumn("rn", row_number().over(inBucket).cast("long"))
      .join(broadcast(bucketPrefix), "bucket")
      .select((col("bucket_prefix") + col("rn") - 1).as("pos"),
        col("doc_id"), col("shuffle_key"))
  }

  /** q97 — DETERMINISTIC PER-STRATUM CAP: keep at most `n` docs per
    * language, selected by seeded-hash order (md5(doc_id:seed)) — the
    * reproducible "cap every source at N" downsample that blunt-balances a
    * mixture before q92's weighting refines it. Selection by hash order
    * means the kept set is a uniform random sample, yet stable across runs
    * and engines.
    *
    * The naive form is `row_number over (partition by lang order by key)`
    * — with a 5-value stratum key that is 5 tasks each sorting a fifth of
    * the corpus (the exact ceiling q57 and q86 avoid). So the per-stratum
    * rank runs the q86 two-level shape WITHIN each stratum: hash-prefix
    * buckets split every stratum 16^prefixChars ways, per-(stratum,
    * bucket) counts prefix-sum over a tiny relation, and the in-bucket
    * row_number runs on (stratum, bucket) partitions — corpus-sized stages
    * all hash-partition on a well-spread composite key. Emits the per-lang
    * position so the oracle pins the full permutation, not just
    * membership.
    */
  def stratumCapSample(spark: SparkSession, dir: String, n: Long = 50L,
                       seed: Long = 42L, prefixChars: Int = 2): DataFrame =
    stratumHashRank(spark, dir, seed, prefixChars)
      .filter(col("pos") <= n)
      .select(col("doc_id"), col("lang"), col("pos"))

  /** The per-stratum seeded-hash rank shared by q97 and q104: every doc's
    * 1-based position within its language under the md5(doc_id:seed) order,
    * computed with the q86 two-level shape WITHIN each stratum (hash-prefix
    * buckets, tiny per-(stratum, bucket) prefix-sum relation, in-bucket
    * row_number on a well-spread composite key — never one task per
    * stratum). Returns (doc_id, lang, pos), the full permutation. */
  private[graft] def stratumHashRank(spark: SparkSession, dir: String,
                                     seed: Long = 42L, prefixChars: Int = 2): DataFrame =
    hashRankWithin(Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      "lang", "doc_id", seed, prefixChars)

  /** The generic two-level seeded-hash rank within an arbitrary stratum
    * column — the q86 shape over any (id, stratum) relation: hash-prefix
    * buckets, a tiny broadcast per-(stratum, bucket) prefix-sum relation,
    * in-bucket row_number on a well-spread composite key. Never one task
    * per stratum: the widest window partition is a (stratum, bucket)
    * cell, 16^prefixChars times smaller than the stratum. Returns
    * (idCol, stratumCol, pos) — pos is the doc's 1-based position within
    * its stratum under the md5(id:seed) permutation. */
  private[graft] def hashRankWithin(df: DataFrame, stratumCol: String,
                                    idCol: String, seed: Long,
                                    prefixChars: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(prefixChars >= 1 && prefixChars <= 8, s"prefixChars out of range: $prefixChars")
    val keyed = df
      .select(col(idCol), col(stratumCol),
        md5(concat(col(idCol).cast("string"), lit(s":$seed"))).as("skey"))
      .withColumn("bucket", substring(col("skey"), 1, prefixChars))
    val bucketPrefix = keyed.groupBy(col(stratumCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("bucket_prefix",
        coalesce(sum(col("cnt")).over(
          Window.partitionBy(col(stratumCol)).orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(stratumCol), col("bucket"), col("bucket_prefix"))
    val inBucket = Window.partitionBy(col(stratumCol), col("bucket"))
      .orderBy(col("skey"), col(idCol))
    keyed
      .withColumn("rn", row_number().over(inBucket).cast("long"))
      .join(broadcast(bucketPrefix), Seq(stratumCol, "bucket"))
      .withColumn("pos", col("bucket_prefix") + col("rn"))
      .select(col(idCol), col(stratumCol), col("pos"))
  }

  /** q129 — CLUSTER-BALANCED SAMPLE (invariant): diversity-preserving
    * subsampling in embedding space — Lloyd's k-means over the embedding
    * table (the q43 codebook machinery, bounded driver state of
    * nClusters×dim), then a seeded per-CLUSTER cap-N downsample via the
    * same two-level hash rank q97 applies per language. This is the
    * "cluster then thin the dense regions" selection step of SemDeDup /
    * DataComp-style curation: capping every cluster at `cap` flattens the
    * density profile so over-represented semantic neighborhoods can't
    * dominate the training mix.
    *
    * Invariant row (q34 discipline) because cluster ids are engine-float
    * Lloyd's output DuckDB cannot replay: the oracle recounts n_vecs and
    * pins the violation counters at zero — over_cap = total kept rows
    * above cap across clusters (the cap actually binds), underfill =
    * clusters keeping fewer than min(cap, size) rows (the rank is a
    * complete permutation; nothing was lost).
    *
    * Scale shape: training and assignment are the audited q43 paths (no
    * corpus shuffle); the rank is the two-level form, so the widest
    * single task is a (cluster, hash-prefix) cell; the per-cluster
    * rollup is a nClusters-row relation. */
  def clusterBalancedSample(spark: SparkSession, dir: String,
                            nClusters: Int = 8, cap: Long = 40L,
                            iters: Int = 3, seed: Long = 42L,
                            prefixChars: Int = 2): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val cents = Similarity.trainCentroids(e, nClusters, iters)
    val assigned = Similarity.ivfAssign(e, cents)
      .select(col("vec_id"), col("list_id").as("cluster"))
    val ranked = hashRankWithin(assigned, "cluster", "vec_id", seed, prefixChars)
    val perCluster = ranked.groupBy(col("cluster")).agg(
      count(lit(1)).as("size"),
      sum(when(col("pos") <= cap, 1L).otherwise(0L)).as("kept"))
    materialized(perCluster.agg(
      sum(col("size")).cast("long").as("n_vecs"),
      sum(when(col("kept") > cap, col("kept") - lit(cap)).otherwise(lit(0L)))
        .cast("long").as("over_cap"),
      sum(when(col("kept") < least(lit(cap), col("size")), 1L).otherwise(0L))
        .cast("long").as("underfill")))
  }

  /** q104 — MIXTURE EPOCH RESAMPLING: materialize q92's temperature-scaled
    * mixture as an explicit per-doc copy manifest — the step that turns
    * "source s gets probability p_s" into the actual epoch a training
    * loader reads. Each language's target doc count is
    * floor(round(p_temp, 6) · epochBudget) (the q92 arithmetic, same
    * 6dp-decimal truncation on both engines); within a language every doc
    * gets target div n base copies and the first target mod n docs — in
    * the seeded-hash order of [[stratumHashRank]] — one extra, so
    * upsampled low-resource strata repeat uniformly (copy counts differ by
    * at most one) and downsampled strata keep a uniform random subset.
    * Deterministic: same seed → the same epoch, row for row.
    *
    * Scale shape: the targets relation is |langs| rows (broadcast); the
    * rank is the two-level per-stratum form; the manifest emits one row
    * per SOURCE doc (n_copies > 0), never target-many rows — the loader
    * expands copies, the engine only plans them.
    */
  def mixtureResample(spark: SparkSession, dir: String, alpha: Double = 0.7,
                      epochBudget: Long = 1000L, seed: Long = 42L,
                      prefixChars: Int = 2): DataFrame = {
    def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("div", a, b)
    val ranked = stratumHashRank(spark, dir, seed, prefixChars)
    val counts = Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", pow(col("n_docs").cast("double"), alpha))
    val totals = counts.agg(sum(col("w")).as("total_w"))
    // the q92 decimal discipline: round at 6dp in DECIMAL and floor the
    // exact decimal product, so neither engine's double multiply can
    // straddle an integer boundary
    val targets = counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_docs"),
        floor(round((col("w") / col("total_w"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 18)), 6)
          * epochBudget).cast("long").as("target"))
    ranked.join(broadcast(targets), "lang")
      .withColumn("n_copies",
        idiv(col("target"), col("n_docs"))
          + when(col("pos") <= col("target") % col("n_docs"), 1L).otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"), col("n_copies"))
  }

  /** q111 — GROUP-AWARE (LEAKAGE-SAFE) SPLIT: assign every document of a
    * SOURCE to the same train/val/test split, so near-duplicates and
    * shared boilerplate inside a source can never straddle the split
    * boundary — the leakage guard a per-doc randomSplit (D3) cannot give.
    * The split is a pure function of the group key: p = md5(source:seed),
    * compared LEXICOGRAPHICALLY against hex thresholds ('cccccccc' =
    * 0.8·16^8, 'e6666666' = 0.9·16^8) — both engines compare the same
    * lowercase hex bytes, no float fraction anywhere. Per-row expression,
    * no shuffle, no group materialization; deterministic: same seed →
    * same assignment at any scale.
    */
  /** The 80/10/10 hex-threshold split as a pure function of any key
    * column — shared by the group-aware split (q111, key = source) and
    * the leakage audit's per-doc baseline (q187, key = doc_id). */
  private[graft] def splitOf(key: org.apache.spark.sql.Column,
                             seed: Long): org.apache.spark.sql.Column = {
    val p = md5(concat(key, lit(":" + seed)))
    when(p < "cccccccc", "train")
      .when(p < "e6666666", "val")
      .otherwise("test")
  }

  def groupAwareSplit(spark: SparkSession, dir: String, seed: Long = 42L,
                      groupCol: String = "source"): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col(groupCol),
        splitOf(col(groupCol), seed).as("split"))

  /** D32 [EXT] — SPLIT LEAKAGE AUDIT: does any near-duplicate pair
    * straddle a train/val/test boundary? The measurement that justifies
    * D16's group-aware split: per split-assignment strategy
    * (group-aware by source vs the naive per-doc hash split, SAME hex
    * thresholds), the exact-Jaccard near-dup pairs rolled up by
    * unordered split cell with a `leaky` flag on cross-split cells. The
    * group-aware rows can still leak ACROSS sources — that residue is
    * exactly what this audit quantifies; the per-doc rows show the
    * within-source leakage the group split exists to kill.
    *
    * Scale: the pair relation — the expensive part — is the session-
    * shared [[Dedup.ensureJaccardPairs]] leaf (built once per (session,
    * dir, threshold), consumed here for both strategies — the q181
    * one-pass-many-gates shape); each strategy adds two id-grain split
    * joins and a hash agg on the 6-cell key.
    */
  def splitLeakageAudit(spark: SparkSession, dir: String,
                        threshold: Double = 0.5, seed: Long = 42L): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.ensureJaccardPairs(spark, dir, threshold)
      .select(col("doc_a"), col("doc_b"))
    def strat(name: String, key: org.apache.spark.sql.Column): DataFrame = {
      val s = docs.select(col("doc_id"), splitOf(key, seed).as("split"))
      pairs
        .join(s.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
        .join(s.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
        .groupBy(least(col("sa"), col("sb")).as("split_a"),
          greatest(col("sa"), col("sb")).as("split_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .select(lit(name).as("strategy"), col("split_a"), col("split_b"),
          col("n_pairs"), (col("split_a") =!= col("split_b")).as("leaky"))
    }
    strat("group_aware", col("source"))
      .unionByName(strat("per_doc", col("doc_id").cast("string")))
  }

  /** D4+D5 — hash repartition (reference
    * /root/reference/src/preprocessing_pipeline.py:273: repartition(16, Path))
    * + partition introspection kept inside SQL via spark_partition_id()
    * (no rdd.glom round-trip). Output: exact partition count and the
    * min/max rows per partition sanity bounds folded to one row.
    */
  def repartitionIntrospect(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .repartition(16, col("l_orderkey"))
      .groupBy(spark_partition_id().as("pid"))
      .agg(count(lit(1)).as("rows"))
      .agg(
        countDistinct(col("pid")).as("n_partitions"),
        (max(col("rows")) > 0).as("all_nonempty"))

  /** q125 — WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis
    * A-ES): draw `k` docs where a doc's inclusion odds scale with its
    * weight (here n_chars — "sample proportional to length" is how a
    * token-budget subsample stays unbiased per token rather than per doc).
    * A-ES turns the draw into a top-k: each doc gets key = −ln(u)/w for
    * u ~ U(0,1), and the k SMALLEST keys are exactly a weighted sample
    * without replacement — one corpus pass, no sequential draws.
    *
    * Determinism without an engine RNG: u is the doc's mid-rank quantile
    * u = (pos + ½)/N under the q86 seeded-hash permutation — a uniform
    * grid assigned in md5 order, independent of the weights, reproducible
    * bit-for-bit on any engine. The rank reuses [[globalShuffleRank]]'s
    * distributed two-level form (never a one-task window); the final cut
    * is a TakeOrdered. ln carries the documented q92 libm-ulp caveat; ties
    * on the 6dp-rounded key break by doc_id.
    */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 100,
                     seed: Long = 42L, prefixChars: Int = 2): DataFrame = {
    val ranks = globalShuffleRank(spark, dir, seed, prefixChars)
      .select(col("doc_id"), col("pos"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docs.join(ranks, "doc_id")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("n_chars"),
        round(-log((col("pos").cast("double") + 0.5) / col("n_docs")) /
          col("n_chars"), 6).as("es_key"))
      .orderBy(col("es_key"), col("doc_id"))
      .limit(k)
  }
}
