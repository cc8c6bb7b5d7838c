package graft.operators

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents fixture (SURVEY §2.2 P10
  * [EXT]): token counting, quality scoring, language ID, fingerprinting,
  * explode-based token stats. All per-row or single-shuffle aggregations —
  * the shapes that stream through a 100 TB corpus scan.
  */
object TextAnalysis {

  /** Per-document metrics: whitespace tokens, BPE-ish subword tokens,
    * quality score, stopword/alpha ratios. Pure per-row expressions (one
    * scan, no shuffle). */
  def docMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TF.nTokens(col("text")).cast("long").as("n_tokens"),
      size(TF.subwordTokens(col("text"))).cast("long").as("n_subwords"),
      length(col("text")).cast("long").as("n_chars_c"),
      round(TF.stopwordRatio(col("text")), 6).as("stopword_ratio"),
      round(TF.alphaRatio(col("text")), 6).as("alpha_ratio"),
      TF.qualityScore(col("text")).as("quality"))

  /** Language ID vs the labeled lang column; also reports agreement so the
    * heuristic's hit-rate is visible in the result. */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("lang").as("labeled_lang"),
      TF.langId(col("text")).as("predicted_lang"))

  /** Content fingerprints: exact hash, canonical (order-insensitive)
    * fingerprint, and a 64-bit doc signature from the canonical md5. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TF.contentHash(col("text")).as("content_sha256"),
      TF.canonicalFingerprint(col("text")).as("canonical_md5"))

  /** G1/P3 — split → explode → re-aggregate (reference shape:
    * /root/reference/src/preprocessing_pipeline.py:145-151). Global token
    * frequency: the explode fans out ~n_tokens× rows, then a hash agg on
    * the token collapses them; partial aggregation keeps the shuffle at
    * |vocab| per partition.
    */
  def tokenFrequency(spark: SparkSession, dir: String, minCount: Long = 100): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TF.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** q83 — heavy-hitter tokens via SKETCH PREFILTER + EXACT VERIFY: the
    * fixed-memory alternative to [[tokenFrequency]]'s full vocabulary
    * aggregate. Pass 1 runs Misra–Gries (`stat.freqItems`) over the
    * exploded tokens — per-partition state is a bounded 1/support-entry
    * map regardless of vocabulary size, and the guarantee is one-sided:
    * every token with relative frequency > support IS in the candidate
    * set (false positives possible, false negatives not). Pass 2 counts
    * ONLY the ≤1/support candidates exactly (a broadcast semi-filter
    * before the aggregate, so the shuffle carries candidate tokens, not
    * the vocabulary) and keeps those truly above the threshold. The
    * composition is therefore EXACT — deterministic rows under a plain
    * HAVING oracle — while the full-vocab hash agg it replaces carries
    * |vocab| state per partition, the thing that breaks first on a
    * 100 TB corpus with billion-token vocabularies.
    */
  def heavyHitterTokens(spark: SparkSession, dir: String,
                        support: Double = 0.001): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(TF.tokens(col("text"))).as("token"))
      .localCheckpoint(true) // feeds the sketch pass, the count, and the verify pass
    val n = toks.count()
    // Misra-Gries candidates: bounded driver result (≤ ~1/support items)
    val candidates = toks.stat.freqItems(Seq("token"), support)
      .head().getSeq[String](0)
    val threshold = (support * n).toLong // keep tokens with cnt > support·N
    toks.filter(col("token").isin(candidates: _*))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > threshold)
  }

  /** Per-language rollup joining metrics: lang → docs, tokens, mean
    * quality. One scan + one shuffle on the (tiny) lang key. */
  def langRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TF.nTokens(col("text")).cast("long")).as("n_tokens"),
        round(avg(length(col("text"))), 6).as("avg_chars"))

  /** q44 — the composed training-data curation pass every LLM corpus goes
    * through: per-row quality score → threshold filter → exact content
    * dedup (keep lowest doc_id) → per-language survivor counts. Pure
    * expressions + two hash aggregations: quality filtering streams through
    * the scan (pushdown-friendly), dedup shuffles once on the content hash,
    * the rollup once on the tiny lang key — the whole pass is one linear
    * pipeline at 100 TB.
    */
  def corpusCuration(spark: SparkSession, dir: String, minQuality: Double = 0.5): DataFrame =
    Tables.documents(spark, dir)
      .filter(TF.qualityScore(col("text")) >= minQuality)
      .select(col("doc_id"), col("lang"), TF.contentHash(col("text")).as("h"))
      .groupBy(col("h"))
      .agg(min_by(col("lang"), col("doc_id")).as("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))

  /** [[corpusCuration]] with OBSERVED pipeline metrics: `observe()`
    * attaches `CollectMetrics` aggregates to the flowing rows, so the
    * counters a production curation job reports — rows scanned, rows past
    * the quality gate, distinct languages, mean quality of survivors —
    * are computed DURING the one pass the query already makes. At 100 TB
    * the alternative is a second full scan per counter; observe costs one
    * accumulator merge per task. Returns (result, observation handle);
    * metrics materialize when the result is acted on (spec-pinned equal
    * to independently-computed values).
    */
  def corpusCurationObserved(spark: SparkSession, dir: String,
                             minQuality: Double = 0.5)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("curation_metrics")
    val gated = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"),
        TF.qualityScore(col("text")).as("quality"))
      .observe(obs,
        count(lit(1)).as("rows_scanned"),
        sum((col("quality") >= minQuality).cast("long")).as("rows_kept"),
        approx_count_distinct(col("lang")).as("langs_seen"),
        round(avg(when(col("quality") >= minQuality, col("quality"))), 6)
          .as("mean_kept_quality"))
      .filter(col("quality") >= minQuality)
    val result = gated
      .select(col("doc_id"), col("lang"), TF.contentHash(col("text")).as("h"))
      .groupBy(col("h"))
      .agg(min_by(col("lang"), col("doc_id")).as("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
    (result, obs)
  }

  /** q55 — the full curation pipeline with NEAR-dup (not just exact-hash)
    * dedup: quality-gate the corpus, resolve near-duplicate clusters over
    * the survivors ([[Dedup.dedupCorpusFor]]: MinHash-LSH pairs →
    * connected components → keep-lowest), and roll up what remains per
    * language. This is the composed operation a training-data pipeline
    * runs end to end; every stage is the oracle-checked operator it reuses
    * (q44's quality gate, q52's cluster resolution, q29's rollup shape).
    */
  def corpusCurationNearDup(spark: SparkSession, dir: String,
                            minQuality: Double = 0.5, threshold: Double = 0.5): DataFrame = {
    val qualityDocs = Tables.documents(spark, dir)
      .filter(TF.qualityScore(col("text")) >= minQuality)
    Dedup.dedupCorpusFor(qualityDocs, threshold)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"))
  }

  /** q57 — order statistics over the quality score, exact + approx side by
    * side (the q10 pattern for quantiles): the exact quantile is defined
    * by RANK — the value at row ceil(p·n) under the total order
    * (quality, doc_id) — which both engines reproduce bit-exactly, unlike
    * interpolated percentiles whose `(1-f)a + fb` arithmetic differs in
    * the last ulp across engines. percentile_approx (the one-pass
    * KLL-style sketch) rides along with a within-tolerance boolean. This
    * is the operator that picks a corpus quality threshold ("keep the top
    * decile") from the score distribution.
    *
    * The exact side is DISTRIBUTED SELECTION, not a sort: the rank-r
    * value under (quality, doc_id) depends only on the quality marginal —
    * value(r) = min{v : #rows with quality ≤ v ≥ r}, doc_id ties can
    * never change which VALUE sits at a rank — so it reads off a
    * per-(lang, quality) histogram (one map-side-combined shuffle on the
    * well-spread composite key) with a cumulative sum over the HISTOGRAM.
    * The window's partition is bounded by the distinct rounded quality
    * values per language (≤ 1e6 + 1 at 6dp), independent of corpus size;
    * the earlier row_number form shuffled every corpus row into one task
    * per language — ~5 tasks sorting ~20 TB each at the 100 TB target.
    */
  def qualityQuantiles(spark: SparkSession, dir: String,
                       ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), TF.qualityScore(col("text")).as("quality"))
    val hist = q.groupBy(col("lang"), col("quality")).agg(count(lit(1)).as("cnt"))
    val cum = hist
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("lang"))))
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("lang")).orderBy(col("quality"))))
    val exact = ps.map { p =>
      cum.filter(col("cum") >= ceil(col("n") * p))
        .groupBy(col("lang"))
        .agg(min(col("quality")).as("value"))
        .select(col("lang"), lit(p).as("p"), col("value"))
    }.reduce(_.unionByName(_))
    val approx = q.groupBy(col("lang"))
      .agg(percentile_approx(col("quality"),
        array(ps.map(lit): _*), lit(10000)).as("ap"))
      .select(col("lang"), posexplode(col("ap")))
      .select(col("lang"), element_at(array(ps.map(lit): _*), col("pos") + 1).as("p"),
        col("col").as("approx_value"))
    exact.join(approx, Seq("lang", "p"))
      .withColumn("approx_within_tol", abs(col("approx_value") - col("value")) <= 0.05)
      .select(col("lang"), col("p"), col("value"), col("approx_within_tol"))
  }

  /** q45 — J2 label-vector assembly (reference: the 5-column label matrix
    * bolted onto image paths, /root/reference/src/federated_learning_pipeline.py:29-33,
    * 61-68): an in-row array() projection, no join needed, emitted in
    * exploded (doc_id, dim, label) form so the oracle comparison is
    * layout-independent.
    */
  def labelVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        posexplode(array(
          (col("lang") === "en").cast("double"),
          (col("source") === "web").cast("double"),
          (TF.nTokens(col("text")) > 100).cast("double"),
          (TF.qualityScore(col("text")) >= 0.5).cast("double"),
          (col("doc_id") % 2 === 0).cast("double"))))
      .toDF("doc_id", "dim", "label")
      .select(col("doc_id"), col("dim").cast("long").as("dim"), col("label"))
}
