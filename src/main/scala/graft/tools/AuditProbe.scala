package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Scratch diagnostics — distribution of the simhash hamming distance and
  * the winnowed shared-fingerprint count over the EXACT near-dup pairs
  * (full-shingle Jaccard), at several Jaccard bands. Drives the band
  * constants of the q163/q164 estimator audits (round-11 verdict item 7):
  * the audits pin "sketch decision agrees with exact" per pair, so the
  * pinned thresholds must come from the fixture's measured margins, not
  * hope.
  *
  * Usage: runMain graft.tools.AuditProbe <sfDir>
  */
object AuditProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local("audit-probe", "16")
    val docs = graft.Tables.documents(spark, dir)
    val pairs = graft.sources.Sources.spillScratch(
      Dedup.ngramJaccardPairsFor(docs, 0.3), "ap_pairs")
    println(s"[probe] exact pairs J>=0.3: ${pairs.count()}")

    // simhash hamming per exact pair
    val sigs = Dedup.simhashSignatures(docs)
    val withHam = pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), "doc_b")
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
    withHam.withColumn("jband",
        when(col("jaccard") >= 0.9, "J>=0.9").when(col("jaccard") >= 0.7, "J>=0.7")
          .when(col("jaccard") >= 0.5, "J>=0.5").otherwise("J>=0.3"))
      .groupBy("jband")
      .agg(count(lit(1)).as("n"), min("hamming").as("min_h"),
        expr("percentile(hamming, 0.5)").as("med_h"),
        expr("percentile(hamming, 0.95)").as("p95_h"), max("hamming").as("max_h"),
        sum(when(col("hamming") <= 3, 1L).otherwise(0L)).as("n_detected_h3"))
      .orderBy("jband")
      .collect().foreach(r => println(s"[probe] simhash $r"))

    // winnowed shared-fp count per exact pair (non-hot fps, q65 params)
    val fps = graft.sources.Sources.spillScratch(
      Dedup.winnowingFingerprints(docs).withColumnRenamed("fp", "shingle"), "ap_fp")
    val fpHot = fps.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > 1000).select(col("shingle"))
    val cool = fps.join(fpHot, Seq("shingle"), "left_anti")
    val shared = cool.as("x").join(cool.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
    val withFp = pairs.join(shared, Seq("doc_a", "doc_b"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
    withFp.withColumn("jband",
        when(col("jaccard") >= 0.9, "J>=0.9").when(col("jaccard") >= 0.7, "J>=0.7")
          .when(col("jaccard") >= 0.5, "J>=0.5").otherwise("J>=0.3"))
      .groupBy("jband")
      .agg(count(lit(1)).as("n"), min("n_shared").as("min_fp"),
        expr("percentile(n_shared, 0.05)").as("p05_fp"),
        expr("percentile(n_shared, 0.5)").as("med_fp"),
        sum(when(col("n_shared") >= 2, 1L).otherwise(0L)).as("n_cand_ge2"))
      .orderBy("jband")
      .collect().foreach(r => println(s"[probe] winnow $r"))
    spark.stop()
  }
}
