package graft.operators

import graft.Tables
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family (SURVEY §2.5 D1/D6, §2.3 J3): exact key dedup,
  * content-hash dedup, n-gram Jaccard near-dup, MinHash+LSH near-dup,
  * SimHash near-dup.
  *
  * Scale design: every variant is candidate-generation-by-equi-join —
  * shingle match, LSH band bucket, or SimHash band bucket — never an O(n²)
  * cross join. The quadratic step only runs inside a candidate bucket,
  * which is the standard way these stay tractable at 100 TB.
  */
object Dedup {

  /** D1 — dropDuplicates on a projection (≡ SELECT DISTINCT; reference
    * /root/reference/src/preprocessing_pipeline.py:279-283). Restricted to
    * the projected key so the kept-row is well-defined (full-row
    * dropDuplicates with a key subset keeps an arbitrary row — not
    * oracle-comparable).
    */
  def dropDuplicatesProjected(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderstatus"))
      .dropDuplicates(Seq("o_custkey", "o_orderstatus"))

  /** Exact content-hash dedup over a (synthetically doubled) corpus:
    * sha-256 the text, group, report dup groups. The doubling
    * (unionByName) plants exact duplicates so the operator has work to do
    * — the fixture corpus itself has none.
    */
  def exactContentDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.unionByName(docs)
      .select(col("doc_id"), TF.contentHash(col("text")).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keep_doc_id"))
      .filter(col("cnt") > 1)
  }

  /** Distinct (doc_id, shingle) pairs — the shared leaf of the near-dup
    * operators. Cached by callers when fanned out.
    *
    * Built with a typed flatMap rather than the expression-level
    * `explode(TF.shingles(...))`: the shingle lambda (slice + concat_ws
    * per element) evaluates through Catalyst's interpreted higher-order
    * path at ~11 µs per shingle, which made this leaf alone cost ~6 s at
    * sf0.1; the compiled sliding-window closure is ~100× cheaper and
    * byte-identical in output (split keeps trailing empties, exactly like
    * Spark's `split(text, " ", -1)` and DuckDB's string_split).
    * TF.shingles remains the expression-level API for SQL composition.
    */
  def docShingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(" ", -1)
        if (toks.length < n) Iterator.empty
        else {
          // "distinct (doc_id, shingle)" is per-document by construction,
          // so dedup inside the row with a doc-bounded HashSet — a
          // DataFrame-level distinct() would shuffle the full shingle
          // table to deduplicate what never crosses rows
          val seen = scala.collection.mutable.HashSet.empty[String]
          toks.sliding(n).flatMap { w =>
            val s = w.mkString(" ")
            if (seen.add(s)) Iterator.single((id, s)) else Iterator.empty
          }
        }
      }
      .toDF("doc_id", "shingle")
  }

  /** Candidate (doc_a, doc_b) pairs sharing ≥1 non-hot shingle — the
    * inverted-index equi-join, never a cross join. `dfCap` drops shingles
    * whose document frequency exceeds the cap from CANDIDATE GENERATION
    * only (exact Jaccard is still computed over full shingle sets by
    * [[jaccardForCandidates]]): one stop-shingle bucket ("of the and") is
    * quadratic in its df, so at 100 TB the cap bounds every bucket at
    * O(cap²) while near-dup pairs above any useful threshold keep their
    * candidacy through rarer shared shingles. The default cap (1000) is a
    * no-op at fixture scale (max observed df: 25 at sf0.1) so the oracle
    * comparison stays exact.
    */
  def candidatePairs(sh: DataFrame, dfCap: Int = 1000): DataFrame = {
    val rare =
      if (dfCap > 0) {
        val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > dfCap).select(col("shingle"))
        // hot set is tiny by construction (few shingles exceed the cap)
        sh.join(broadcast(hot), Seq("shingle"), "left_anti")
      } else sh
    rare.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(rare.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Exact Jaccard restricted to the given candidate pairs: join the pair
    * list back to per-doc shingle sets — |A∩B| counts the shingles shared
    * along each candidate pair, |A|/|B| come from per-doc sizes. Cost is
    * O(|candidates| × avg shingles/doc), linear in the candidate set, so
    * whatever generated the candidates (inverted index, MinHash bands)
    * bounds the whole verification. All-integer until the final division —
    * oracle-exact.
    */
  def jaccardForCandidates(cand: DataFrame, sh: DataFrame, threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val inter = cand
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
      .filter(col("inter").cast("double") >= col("na") * threshold) // J ≥ t ⟹ inter ≥ t·na
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
      .filter(col("inter").cast("double") >= col("nb") * threshold)
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Brute-force n-gram Jaccard near-dup, computed in ONE pass over the
    * inverted-index self-join: |A∩B| per pair falls directly out of
    * groupBy(pair).count() on the co-occurrence rows — no candidate
    * materialization and no re-join against per-doc shingle sets (at sf0.1
    * the corpus has 1.13M candidate pairs sharing ≥1 shingle; routing them
    * through [[jaccardForCandidates]] would build a ~59M-row verification
    * join for pairs that overwhelmingly share exactly one shingle).
    *
    * The hot-shingle cap excludes shingles with df > dfCap from the
    * self-join (the skew guard: one stop-shingle bucket is df²-quadratic);
    * their contribution to |A∩B| is then restored EXACTLY by a correction
    * join of the surviving pairs against only the hot rows — cheap because
    * few shingles are hot by definition. Net semantics: a pair must share
    * ≥1 non-hot shingle to be found (documented cap trade-off; a no-op at
    * fixture scale where max df = 25), and every found pair's Jaccard is
    * exact over the FULL shingle sets.
    *
    * The shingle table feeds four plan branches — cached; at 100 TB this
    * is where you checkpoint the shingle index to a sink instead.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    ngramJaccardPairsFor(Tables.documents(spark, dir), threshold)

  def ngramJaccardPairsFor(docs: DataFrame, threshold: Double = 0.5,
                           dfCap: Int = 1000): DataFrame = {
    val sh = docShingles(docs).cache()
    val hot = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select(col("shingle"))
    val rare = sh.join(broadcast(hot), Seq("shingle"), "left_anti")
    val interRare = rare.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(rare.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_rare"))
    val hotSh = sh.join(broadcast(hot), Seq("shingle"), "left_semi")
    val interHot = interRare.select(col("doc_a"), col("doc_b"))
      .join(hotSh.select(col("doc_id").as("doc_a"), col("shingle")), "doc_a")
      .join(hotSh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_hot"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    // J ≥ t ⟹ inter ≥ t·na (and ≥ t·nb, since |A∩B| ≤ |B| bounds the
    // union below by |A|): filtering right after the first size join
    // discards the dominant inter=1 mass — 1.13M candidate pairs at sf0.1
    // collapse to the few hundred that can possibly clear the threshold —
    // before the second join runs
    interRare
      .join(interHot, Seq("doc_a", "doc_b"), "left")
      .withColumn("inter", col("inter_rare") + coalesce(col("inter_hot"), lit(0L)))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
      .filter(col("inter").cast("double") >= col("na") * threshold)
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
      .filter(col("inter").cast("double") >= col("nb") * threshold)
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** D6 — MinHash signatures: per-doc element-wise min over the k hash
    * values of its shingles (map-side-combined scalar min aggregates; the
    * shuffle carries one k-long buffer per doc per partition).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 128): DataFrame =
    minhashSignaturesFromShingles(docShingles(docs), k)

  /** Per-shingle hash family: the variable-length shingle string is hashed
    * ONCE to a 64-bit base value, and the k family members are xxhash64
    * over the fixed-width (seed_i, base) pair — k cheap 12-byte hashes
    * instead of k full string hashes over the hottest column in the dedup
    * family. (The h1 + i·h2 linear construction would be cheaper still but
    * wraps 64-bit arithmetic, which ANSI mode — on by default in Spark 4 —
    * rejects as overflow.)
    *
    * The k-wide element-wise min runs as k scalar `min` aggregates — fully
    * inside whole-stage codegen with map-side partials, no per-row array
    * allocation — and the signature array is assembled once per GROUP
    * afterwards. Shuffle volume is identical to the ArrayMinAgg form (one
    * k-wide buffer per doc per partition); the saving is the per-ROW cost
    * on the 50×-larger input side. ArrayMinAgg remains the general
    * combiner for data whose width is not a compile-time constant.
    */
  def minhashSignaturesFromShingles(sh: DataFrame, k: Int): DataFrame = {
    val base = sh.select(col("doc_id"), xxhash64(col("shingle")).as("h1"))
    val minCols = (0 until k).map(i => min(xxhash64(lit(i), col("h1"))).as(s"m$i"))
    base.groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("signature"))
  }

  /** D6/J3 — full MinHash-LSH near-dup pipeline:
    * shingle → minhash(k=128) → band (32 bands × 4 rows) → band-hash
    * equi-join → exact-Jaccard verification of ONLY the candidate pairs
    * (via [[jaccardForCandidates]] — the brute-force all-pairs Jaccard is
    * never computed, which is the entire point of LSH).
    *
    * Banding: P(pair lands in ≥1 band) = 1-(1-s⁴)³² — ≈1 for s≥0.8
    * (miss ≈ 1e-9 at s=0.8), ≈0.03 for s≤0.5, so the output matches the
    * exact-Jaccard oracle for well-separated corpora (the fixture's
    * near-dups all have s≥0.8) while candidate generation stays
    * near-linear: the shuffle carries one 128-long signature per doc, and
    * the band self-join only explodes within equal-band buckets.
    */
  def minhashLshPairs(spark: SparkSession, dir: String,
                      k: Int = 128, bands: Int = 32, threshold: Double = 0.5): DataFrame =
    minhashLshPairsFor(Tables.documents(spark, dir), k, bands, threshold)

  def minhashLshPairsFor(docs: DataFrame,
                         k: Int = 128, bands: Int = 32, threshold: Double = 0.5): DataFrame =
    minhashLshPairsCached(docs, k, bands, threshold)._1

  /** [[minhashLshPairsFor]] plus a handle on the cached shingle table it
    * registered, for callers that materialize the pairs eagerly (the
    * cluster-resolution path) and can therefore unpersist the cache
    * instead of leaking it into a long-lived session. */
  private[graft] def minhashLshPairsCached(docs: DataFrame,
                                           k: Int = 128, bands: Int = 32,
                                           threshold: Double = 0.5): (DataFrame, DataFrame) = {
    require(bands > 0 && k % bands == 0,
      s"signature width k=$k must be a positive multiple of bands=$bands")
    val rows = k / bands
    // shared by the signature path and both verification sides (see
    // ngramJaccardPairs for the caching rationale)
    val sh = docShingles(docs).cache()
    val sigs = minhashSignaturesFromShingles(sh, k)
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("signature"), b * rows + 1, lit(rows))))))
      .toDF("doc_id", "band_id", "band_hash")
    val cand = banded.as("x").join(banded.as("y"), Seq("band_id", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    (jaccardForCandidates(cand, sh, threshold), sh)
  }

  /** The 64-bit SimHash of one document: token-frequency-weighted ±1 votes
    * per bit of each token's xxhash64 (seed 42, byte-identical to Spark's
    * `xxhash64(tok)`), sign-packed. Pure per-document function — SimHash
    * needs no cross-row state, so computing it inside the row is the
    * scale-optimal form: ZERO shuffle until the (tiny) band join.
    */
  def simhash64(text: String): Long = {
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    text.split(" ", -1).foreach(t => counts.update(t, counts.getOrElse(t, 0) + 1))
    val votes = new Array[Long](64)
    counts.foreach { case (tok, w) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(tok)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var j = 0
      while (j < 64) { if (((h >>> j) & 1L) == 1L) votes(j) += w else votes(j) -= w; j += 1 }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** SimHash near-dup signatures: one typed map over the corpus (see
    * [[simhash64]]) — the earlier explode → groupBy(doc, tok) → 64-vote
    * aggregation form shuffled the full token table for a quantity that is
    * per-document by definition. Candidates come from 4×16-bit band
    * buckets — pigeonhole guarantees exact recall for hamming ≤ 3 — then
    * verified by bit_count(xor) ≤ maxHamming.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, simhash64(text)) }
      .toDF("doc_id", "simhash")
  }

  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    simhashPairsFor(Tables.documents(spark, dir), maxHamming)

  /** SimHash near-dup over an arbitrary (doc_id, text) frame — the form the
    * planted-near-dup recall spec drives. */
  def simhashPairsFor(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("simhash"), b.cast("int") * 16)
          .bitwiseAND(lit(0xffffL)))))
      .toDF("doc_id", "simhash", "band_id", "band_val")
    banded.as("x").join(banded.as("y"), Seq("band_id", "band_val"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup, EXACT all-pairs form, with the codegen'd
    * cosine kernel (graft.functions.CosineSimilarityExpr). O(n²) pair
    * enumeration with one side broadcast — correct and compute-bound for
    * corpora small enough to broadcast, a scale-killer beyond that; the
    * router [[embeddingNearDupPairs]] owns the decision.
    */
  def embeddingNearDupPairsExactFor(e: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.VectorOps
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    // the cosine threshold lives IN the join condition: the nested-loop
    // join then emits only passing pairs (~0.01% here) instead of
    // materializing n²/2 rows carrying two embedding arrays each — the
    // surviving pairs re-score once, which is negligible
    a.join(b, col("id_a") < col("id_b")
        && round(VectorOps.cosineFast(col("va"), col("vb")), 6) >= threshold)
      .select(col("id_a"), col("id_b"),
        round(VectorOps.cosineFast(col("va"), col("vb")), 6).as("cos"))
  }

  /** Embedding-cosine near-dup via hyperplane-LSH banded candidates + exact
    * re-score — the 100 TB form: signatures are one codegen'd expression
    * per row, candidate generation is a band equi-join (never a cross
    * join), and only candidate pairs pay the exact kernel. Identical to
    * the exact path wherever banding recall ≈ 1 (near-identical pairs:
    * P(miss) < 1e-12 at cos 0.95 with 16×4-bit bands; spec-pinned);
    * recall < 1 at loose thresholds — P(bit agree) = 1 − acos(cos)/π is
    * ≈ 0.63 at cos 0.4, so no banding both prunes and keeps every such
    * pair. That trade is inherent to LSH, not to this implementation.
    */
  def embeddingNearDupPairsBandedFor(e: DataFrame, threshold: Double,
                                     nBits: Int = 64, bandBits: Int = 4): DataFrame = {
    import graft.functions.VectorOps
    require(nBits >= 1 && nBits <= 64 && bandBits > 0 && nBits % bandBits == 0,
      s"need 1 <= nBits <= 64 and nBits=$nBits divisible by bandBits=$bandBits")
    val nBands = nBits / bandBits
    val mask = (1L << bandBits) - 1
    // band table carries ids only; candidates dedup on ids, vectors
    // re-attach afterwards (never shuffle arrays as grouping keys)
    val banded = e
      .select(col("vec_id"), VectorOps.hyperplaneSignature(col("embedding"), nBits).as("sig"))
      .select(col("vec_id"),
        posexplode(transform(sequence(lit(0), lit(nBands - 1)),
          b => call_function("shiftright", col("sig"), b.cast("int") * bandBits)
            .bitwiseAND(lit(mask)))))
      .toDF("vec_id", "band_id", "band_val")
    val cand = banded.as("x").join(banded.as("y"), Seq("band_id", "band_val"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"))
      .distinct()
    cand
      .join(e.select(col("vec_id").as("id_a"), col("embedding").as("va")), "id_a")
      .join(e.select(col("vec_id").as("id_b"), col("embedding").as("vb")), "id_b")
      .withColumn("cos", round(VectorOps.cosineFast(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /** Cosine threshold at and above which the banded path's recall is
    * spec-pinned equal to the exact path's (P(miss) < 1e-12 for
    * near-identical pairs at the default 16×4-bit bands). Below it,
    * banding loses pairs by construction — P(bit agree) = 1 − acos(cos)/π
    * is ≈ 0.63 at cos 0.4 — so the router refuses to swap contracts
    * silently.
    */
  val BandedSafeThreshold: Double = 0.7

  /** Routing counts memoized per (session, dir): the count is one
    * metadata-cheap action (parquet footer row counts), but queries that
    * share a session — q20 and q58 both route — shouldn't re-pay it. */
  private val routingCounts = scala.collection.mutable.Map.empty[(String, String), Long]

  private def corpusRowCount(spark: SparkSession, dir: String, e: DataFrame): Long =
    routingCounts.synchronized {
      routingCounts.getOrElseUpdate(
        (graft.sources.Sources.sessionTag(spark), dir), e.count())
    }

  /** Embedding-cosine near-dup with an explicit scale router:
    *
    *   - n ≤ maxExactRows → the exact all-pairs kernel (every pair with
    *     cos ≥ threshold, the operator's strongest contract) — O(n²) pairs
    *     is affordable and the broadcast side fits;
    *   - n > maxExactRows AND threshold ≥ [[BandedSafeThreshold]] → banded
    *     candidates + exact re-score ([[embeddingNearDupPairsBandedFor]])
    *     — near-linear candidate generation, spec-pinned equal to the
    *     exact path in this threshold regime;
    *   - n > maxExactRows at a LOOSER threshold → refuse: the only scale
    *     path would silently under-recall (and a clustering built on it
    *     would under-merge), so the caller must either raise the
    *     threshold, raise maxExactRows, or opt into the lossy path
    *     explicitly via [[embeddingNearDupPairsBandedFor]].
    *
    * The routing count is one metadata-cheap action against the scan,
    * memoized per (session, dir). At the default 200k rows the exact path
    * enumerates ≤ 2·10¹⁰ candidate comparisons (minutes on a small
    * cluster with the codegen'd kernel, and the broadcast side is ~50 MB
    * at 64 dims); past that the pair count grows quadratically while
    * banded stays near-linear — at 100 TB the router always takes the
    * banded path.
    */
  def embeddingNearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.4,
                            maxExactRows: Long = 200000L): DataFrame = {
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    if (corpusRowCount(spark, dir, e) <= maxExactRows)
      embeddingNearDupPairsExactFor(e, threshold)
    else if (threshold >= BandedSafeThreshold)
      embeddingNearDupPairsBandedFor(e, threshold)
    else
      throw new IllegalArgumentException(
        s"corpus exceeds maxExactRows=$maxExactRows and threshold=$threshold < " +
          s"$BandedSafeThreshold: the banded path under-recalls at loose thresholds " +
          "(P(bit agree) ~= 1 - acos(cos)/pi). Raise the threshold, raise " +
          "maxExactRows, or call embeddingNearDupPairsBandedFor explicitly.")
  }

  /** Connected components over an undirected edge set by iterative
    * min-label propagation: every vertex starts labeled with itself; each
    * round, labels flow across edges and each vertex keeps the minimum it
    * has seen; at fixpoint a component's label is its minimum vertex id.
    *
    * Scale shape: each round is one equi-join + one min-aggregate — all
    * shuffles are on the vertex id, with map-side combine — and rounds
    * needed = graph diameter. Near-dup graphs are unions of near-cliques
    * (diameter 1-2; observed fixpoint in ≤ 3 rounds on the fixtures), so
    * this converges in a handful of linear passes; for adversarial
    * long-chain graphs the large-star/small-star alternation (Kiveris et
    * al., "Connected Components in MapReduce") bounds rounds at
    * O(log² n) and drops in here without changing the contract. Each
    * round's labels are localCheckpoint'ed: lineage stays flat (no
    * exponentially growing plan) and no cache registration leaks past the
    * call — on a real cluster this becomes a checkpoint to durable
    * storage.
    *
    * Throws if maxIter rounds don't reach the fixpoint — an unconverged
    * label table silently mislabels clusters, which a dedup pipeline must
    * never ship.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 25): DataFrame = {
    val e0 = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    var labels = vertices.select(col("id"), col("id").as("lbl")).localCheckpoint(true)
    // fixpoint detector: per-vertex labels are non-increasing, so the label
    // sum strictly decreases until fixpoint — one cheap aggregate per round
    // instead of a prev-vs-next join (decimal sum: overflow-proof under
    // ANSI at any vertex count)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty vertex set: sum is null
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), labels("lbl"))
      val next = labels.union(prop)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** The dedup verb a training-data pipeline actually runs: resolve
    * near-dup PAIRS into clusters and a keep/drop decision per document.
    * Edges are the MinHash-LSH pairs (exact-Jaccard-verified, so the edge
    * set is engine-independent and oracle-reproducible); clusters come
    * from [[connectedComponents]]; the keep rule is lowest doc_id per
    * cluster — deterministic, and the same rule the exact-hash dedup
    * (q16) uses. Output: one row per document with its cluster and the
    * keep verdict; filtering keep=true IS the deduplicated corpus
    * ([[dedupCorpusFor]]). The reference drops duplicate rows at
    * /root/reference/src/preprocessing_pipeline.py:279-283; this is that
    * operation generalized from exact-key equality to near-duplicate
    * clusters.
    */
  def nearDupClustersFor(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val (pairs, sh) = minhashLshPairsCached(docs, threshold = threshold)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val vertices = docs.select(col("doc_id").as("id"))
    // connectedComponents checkpoints the edge set up front, so after it
    // returns nothing references the shingle cache — release it rather
    // than leak it into the session (bench clears caches; users don't)
    val labels =
      try connectedComponents(vertices, edges)
      finally sh.unpersist()
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"),
      (col("lbl") === col("id")).as("keep"))
  }

  def nearDupClusters(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame =
    nearDupClustersFor(Tables.documents(spark, dir), threshold)

  /** The deduplicated corpus itself: keep one representative (lowest
    * doc_id) per near-dup cluster, drop the rest. */
  def dedupCorpusFor(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    docs.join(
      nearDupClustersFor(docs, threshold).filter(col("keep")).select(col("doc_id")),
      Seq("doc_id"), "left_semi")

  /** Semantic (embedding-space) near-dup cluster resolution — the same
    * pairs → connected components → keep rule as [[nearDupClusters]], with
    * cosine pairs as the edge set instead of Jaccard pairs. This is the
    * dedup modern LLM curation runs on embedding similarity (SemDeDup-
    * style): text-level hashing misses paraphrases that embed together.
    * Edges come from the routed [[embeddingNearDupPairs]], so the operator
    * inherits its contract: exact under maxExactRows, banded above only at
    * thresholds where banding is recall-safe — never silently lossy (a
    * lossy edge set would under-merge clusters).
    */
  def embeddingNearDupClusters(spark: SparkSession, dir: String,
                               threshold: Double = 0.4): DataFrame = {
    val pairs = embeddingNearDupPairs(spark, dir, threshold)
    val vertices = Tables.embeddings(spark, dir).select(col("vec_id").as("id"))
    connectedComponents(vertices,
      pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
      .select(col("id").as("vec_id"), col("lbl").as("cluster_id"),
        (col("lbl") === col("id")).as("keep"))
  }
}
