package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture scale-up: tiles the driver-generated sf0.1 testdata by an
  * integer factor (default 10 → "sf1") into a repo-local directory, so the
  * heavy operator families can be MEASURED at 10× instead of argued from
  * plan shape (round-10 verdict item 1: "nothing has ever been run at
  * sf1"). The driver's generator is not available in-container and
  * /root/testdata is read-only, so this derives sf1 from sf0.1 with the
  * three properties a scaling measurement needs:
  *
  *  1. **Key-disjoint replicas.** Every int64 surrogate/foreign key is
  *     shifted by `replica · 10^7`, consistently across fact/dim pairs
  *     (orders.o_custkey moves with customer.c_custkey, lineitem's three
  *     FKs with their parents), so joins scale 10× in rows without
  *     manufacturing cross-replica matches. int32 FKs into the fixed dims
  *     (nation/region) are left alone — dims stay dim-sized, exactly how
  *     a 100 TB warehouse scales.
  *  2. **No synthetic near-dups across replicas.** Replica r > 0 of a
  *     document salts every word at position p ≡ 0 (mod 3) to `w~r<r>`;
  *     every 3-word shingle window contains exactly one salted position,
  *     so NO shingle survives across replicas and the near-dup/minhash/
  *     winnowing/containment families see 10× docs with the ORIGINAL
  *     planted-duplicate density — not a 10-way duplicate of every doc
  *     (which would quadratically inflate candidate pairs by
  *     construction of the fixture rather than by engine behavior).
  *     Token-level consequence: the closed fixture vocabulary opens up
  *     (~4× distinct tokens at factor 10) while the UNSALTED 2/3 of
  *     positions scale their document frequency 10× — exercising the
  *     df-cap / hot-bucket bounds that the closed vocab had hidden.
  *  3. **Decorrelated replica embeddings.** Replica r rotates the dim-64
  *     vector by r positions — norm-preserving (SQ8/audit distributions
  *     unchanged) but uncorrelated with the original, so ANN/semantic
  *     dedup see 10× genuinely distinct points, not 10 copies of each
  *     centroid neighborhood.
  *
  * Events keep their timestamps (10× rows per window — density scales,
  * horizon doesn't, which is how real traffic grows) and shift
  * event_id/user_id.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [outDir] [factor]
  */
object ScaleUp {

  /** Per-replica key offset: far above any sf0.1 key, divisible by the
    * fixture's common plant moduli's products where it matters not at all
    * (plants are density checks here, not oracle targets). */
  val KeyOffset = 10000000L

  /** Cross-join the table with the replica index and shift each named
    * int64 key column by replica · KeyOffset. */
  private def replicate(df: DataFrame, factor: Int, keys: Seq[String]): DataFrame = {
    val reps = df.sparkSession.range(factor).select(col("id").as("__rep"))
    val tiled = df.crossJoin(broadcast(reps))
    val shifted = keys.foldLeft(tiled) { (d, k) =>
      d.withColumn(k, col(k) + col("__rep") * lit(KeyOffset))
    }
    shifted.select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Salt every 3rd word for replicas > 0 so no shingle OR char-gram
    * crosses replicas (see scaladoc pt. 2). The salt is a per-character
    * caesar shift of the WHOLE word, not an affix: the winnowing family
    * fingerprints 16-CHAR grams, and with an affix salt a window that
    * starts after (prefix) or ends before (suffix) the salt inside the
    * salted word is still replica-invariant — measured at sf1 as a ×43
    * cross-replica candidate-pair inflation with either affix. Shifting
    * every letter by the replica index makes ANY window that touches one
    * char of a salted word replica-distinct, so a replica-invariant
    * window must fit between two salted words — ≤ space+w1+space+w2+space
    * ≤ 1+8+1+8+1 chars in this 31-word vocab, where only pairings
    * involving the single 8-char word reach 16. Length-preserving, so
    * n_chars and token counts are unchanged. */
  private def caesar(w: String, rep: Int): String =
    w.map { c =>
      if (c >= 'a' && c <= 'z') ('a' + ((c - 'a' + rep) % 26)).toChar
      else if (c >= '0' && c <= '9') ('0' + ((c - '0' + rep) % 10)).toChar
      else c
    }

  private def saltTextRow(text: String, rep: Int): String =
    if (rep == 0) text
    else text.split(" ", -1).zipWithIndex.map { case (w, p) =>
      if (p % 3 == 0) caesar(w, rep) else w
    }.mkString(" ")

  /** Rotate an array column left by `rep` positions (norm-preserving
    * decorrelation; rep < dim for every factor ≤ dim). */
  private def rotate(arr: Column, rep: Column): Column =
    when(rep === 0, arr).otherwise(
      concat(slice(arr, rep + 1, size(arr) - rep), slice(arr, lit(1), rep)))

  def run(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    require(!out.startsWith("/root/testdata"), "testdata is read-only")
    def rd(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")

    // fixed dims: straight copy
    wr(rd("region"), "region", 1)
    wr(rd("nation"), "nation", 1)

    wr(replicate(rd("customer"), factor, Seq("c_custkey")), "customer", 4)
    wr(replicate(rd("supplier"), factor, Seq("s_suppkey")), "supplier", 1)
    wr(replicate(rd("part"), factor, Seq("p_partkey")), "part", 2)
    wr(replicate(rd("orders"), factor, Seq("o_orderkey", "o_custkey")), "orders", 8)
    wr(replicate(rd("lineitem"), factor,
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem", 32)
    wr(replicate(rd("events"), factor, Seq("event_id", "user_id")), "events", 16)

    val docs = rd("documents")
    import spark.implicits._
    val docsTiled = docs.crossJoin(broadcast(
        spark.range(factor).select(col("id").as("__rep"))))
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("__rep"))
      .as[(Long, String, String, String, Long)]
      .map { case (id, text, lang, source, rep) =>
        val salted = saltTextRow(text, rep.toInt)
        (id + rep * KeyOffset, salted, lang, source, salted.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .select(docs.columns.map(col).toIndexedSeq: _*)
    wr(docsTiled, "documents", 16)

    val emb = rd("embeddings")
    val embTiled = emb.crossJoin(broadcast(
        spark.range(factor).select(col("id").as("__rep"))))
      .withColumn("vec_id", col("vec_id") + col("__rep") * lit(KeyOffset))
      .withColumn("embedding",
        rotate(col("embedding"), col("__rep").cast("int")).cast("array<float>"))
      .select(emb.columns.map(col).toIndexedSeq: _*)
    wr(embTiled, "embeddings", 8)
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-scaleup")
    run(spark, src, out, factor)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"))
      println(s"$t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    spark.stop()
  }
}
